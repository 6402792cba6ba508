"""Byte-pair-encoding token counting (the GPT-2-style merge-rank scheme:
Sennrich et al., "Neural Machine Translation of Rare Words with Subword
Units", ACL 2016; Radford et al. 2019) — tokenizer-accurate token budgets
for packing/filtering, replacing the regex proxy in textproc.token_counts.

Design (the CDC/rolling pattern: a pure-Python reference plus a
Spark-distributed form, parity-tested):

- ``learn_merges_from_counts`` / ``encode`` are pure Python — the frozen
  reference semantics (deterministic: most-frequent pair first, ties by
  lexicographic pair order; encoding applies the lowest-rank mergeable
  pair first, leftmost occurrence first).
- ``learn_merges`` runs the vocabulary aggregation distributed (one
  exploded-word hash agg) and collects only the top ``max_vocab_rows``
  (count desc, word) rows to the driver to learn merge ranks — a BOUNDED,
  deterministic collect (the train_ivf_centroids contract: the gate is in
  code, not prose).  At 100 TB the vocab agg is the same map-side-combined
  shape as q43; the collected table is capped regardless of corpus size.
- ``count_tokens`` applies the broadcast merge ranks with an Arrow-batched
  pandas UDF: per batch, texts are split with the SAME whitespace regex as
  textproc.words, each DISTINCT word is encoded once through a per-batch
  memo (Zipf makes the cache hit rate ~99% on natural text), and the
  per-word token counts are summed.  Python-per-unique-word is inherent to
  BPE (the merge loop is data-dependent); the Arrow batch boundary keeps
  it off the per-row path mandated against by BASELINE.json:15.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WS_RE = re.compile(r"\s+")


# ------------------------------------------------------------- pure reference


def learn_merges_from_counts(
    word_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE training over a (word, count) table: repeatedly merge the
    most frequent adjacent symbol pair (ties -> lexicographically smallest
    pair), ``n_merges`` times or until no pair repeats.  Deterministic for
    a deterministic input table."""
    vocab = {tuple(w): c for w, c in word_counts if w}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        # most frequent pair; ties -> lexicographically smallest pair
        top = max(pairs.values())
        best_pair = min(p for p, c in pairs.items() if c == top)
        if top < 2:
            break  # nothing repeats; further merges are noise
        merges.append(best_pair)
        a, b = best_pair
        ab = a + b
        new_vocab = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def encode(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merge ranks to one word (GPT-2 bpe()): repeatedly merge the
    LOWEST-rank adjacent pair present, leftmost occurrence first, until no
    adjacent pair has a rank.  Pure-Python reference; ''.join(result) ==
    word always."""
    sym = list(word)
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


# ------------------------------------------------------------ distributed form


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) — one exploded-word hash agg (map-side combined), the
    q43 shape; lowercased with the same split textproc.words uses."""
    return (
        df.select(F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def learn_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    max_vocab_rows: int = 20000,
) -> list[tuple[str, str]]:
    """Distributed vocab aggregation + bounded driver-side merge learning.
    The collect is capped at ``max_vocab_rows`` rows ordered (cnt desc,
    word) — deterministic and size-bounded by contract regardless of corpus
    size (truncating a Zipf tail of hapaxes does not change the learned
    merges in practice, and the cap is the documented scale contract)."""
    rows = (
        word_counts(df, text_col)
        .orderBy(F.col("cnt").desc(), "word")
        .limit(int(max_vocab_rows))
        .collect()
    )
    return learn_merges_from_counts([(r["word"], r["cnt"]) for r in rows], n_merges)


def token_count_udf(spark, merges: list[tuple[str, str]]):
    """Arrow-batched BPE token counter: string Series -> long Series.
    Broadcast merge ranks; per-batch distinct-word memo."""
    import pandas as pd

    ranks = {tuple(m): i for i, m in enumerate(merges)}
    bc = spark.sparkContext.broadcast(ranks)

    def fn(s):
        r = bc.value
        memo: dict[str, int] = {}

        def n_tokens(text):
            if text is None:
                return 0
            total = 0
            for w in _WS_RE.split(text.lower()):
                if not w:
                    continue
                n = memo.get(w)
                if n is None:
                    n = len(encode(w, r))
                    memo[w] = n
                total += n
            return total

        return pd.Series([n_tokens(t) for t in s], dtype="int64")

    # explicit-functionType form: postponed annotations break hint inference
    return F.pandas_udf(fn, "long")


def count_tokens(
    df: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_bpe_tokens): tokenizer-accurate counts under the given
    merge list.  Map-only — one Arrow exchange, no shuffle."""
    udf = token_count_udf(df.sparkSession, merges)
    return df.select(
        "doc_id", udf(F.col(text_col)).cast("long").alias("n_bpe_tokens")
    )
