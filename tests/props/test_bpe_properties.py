"""Property + parity tests for the BPE token counter (crawlspark.bpe):
the pure-Python reference is frozen semantics; the Spark-distributed form
must match it exactly (the CDC/rolling twin discipline)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from crawlspark import bpe

WORD = st.text(alphabet="abcdef", min_size=1, max_size=12)


@settings(max_examples=100, deadline=None)
@given(st.lists(WORD, min_size=1, max_size=40), st.integers(0, 30))
def test_encode_is_lossless_and_bounded(words, n_merges):
    """For ANY learned merge table: tokens concatenate back to the word,
    token count is in [1, len(word)], and encoding is deterministic."""
    counts = [(w, 1 + (i % 3)) for i, w in enumerate(words)]
    merges = bpe.learn_merges_from_counts(counts, n_merges)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    for w in words:
        toks = bpe.encode(w, ranks)
        assert "".join(toks) == w
        assert 1 <= len(toks) <= len(w)
        assert bpe.encode(w, ranks) == toks


def test_learned_merges_compress_frequent_pairs():
    """The classic example: a corpus dominated by 'lower'/'low' learns
    ('l','o') then ('lo','w') first, and frequent words end up in few
    tokens while an unseen word stays character-split."""
    counts = [("low", 50), ("lower", 30), ("newest", 10), ("widest", 8)]
    merges = bpe.learn_merges_from_counts(counts, 4)
    assert merges[0] == ("l", "o")
    assert merges[1] == ("lo", "w")
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    assert len(bpe.encode("low", ranks)) == 1
    assert len(bpe.encode("zzz", ranks)) == 3  # no learned pair applies


def test_spark_count_matches_pure_python(spark):
    """Parity of the distributed form: learn merges through the Spark path
    (bounded collect), count through the Arrow UDF, and compare against the
    pure-Python reference applied to the same texts driver-side."""
    rows = [
        (0, "the lowest lower low low the the widest newest"),
        (1, "low low low lower lowest"),
        (2, ""),
        (3, "unrelated zebra quixotic"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe.learn_merges(df, n_merges=20)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe.count_tokens(df, merges).collect()
    }
    for doc_id, text in rows:
        want = sum(
            len(bpe.encode(w, ranks)) for w in text.lower().split() if w
        )
        assert got[doc_id] == want, (doc_id, got[doc_id], want)


def test_token_counts_bpe_variant_and_packing(spark):
    """textproc wiring: token_counts(variant='bpe') adds the tokenizer-true
    column in one map-only pass, and pack_sequences(merges=...) budgets by
    it — seq positions stay inside the budget and offsets are the running
    cumsum of the BPE counts."""
    from crawlspark import textproc

    rows = [
        (i, "low lower lowest newest widest word" + str(i), "s0")
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    merges = bpe.learn_merges(df, n_merges=15)
    tc = textproc.token_counts(df, variant="bpe", merges=merges)
    assert tc.columns == ["doc_id", "n_ws_tokens", "n_re_tokens", "n_bpe_tokens"]
    counts = {r["doc_id"]: r for r in tc.collect()}
    assert all(r["n_bpe_tokens"] >= r["n_ws_tokens"] for r in counts.values())

    packed = textproc.pack_sequences(df, budget=16, merges=merges).collect()
    by_id = sorted(packed, key=lambda r: r["doc_id"])
    # n_tokens column IS the bpe count, and the packing recurrence holds
    offset = 0
    for r in by_id:
        assert r["n_tokens"] == counts[r["doc_id"]]["n_bpe_tokens"]
        assert r["seq_id"] == offset // 16 and r["seq_pos"] == offset % 16
        offset += r["n_tokens"]
