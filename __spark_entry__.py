"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``crawlspark/``; this module only adapts it to the
driver's (spark, sf_dir) -> DataFrame calling convention.
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"
_HERE = os.path.dirname(os.path.abspath(__file__))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: one full frontier-scheduling wave over a frontier derived
    from the sf0.001 documents table — canonicalize + hash64 + exact dedup +
    robots broadcast filter + per-host token-bucket schedule + deterministic
    global crawl_seq.  The north rule's "schedule the next deduped, polite,
    prioritized batch" end-to-end (BASELINE.json:14)."""
    from crawlspark import polite, queries, robots, sched, urlkit

    docs = queries.read(spark, SF0001, "documents")
    # frontier: one URL per doc + an adversarial duplicate of every 3rd URL
    # (same canonical form, different raw string) to exercise dedup
    base = docs.select(
        "doc_id",
        queries._doc_url(F.col("source"), F.col("doc_id"), F.col("n_chars")).alias("url"),
    )
    dups = base.filter(F.col("doc_id") % 3 == 0).withColumn(
        "url", F.concat(F.col("url"), F.lit("#other-fragment"))
    )
    frontier = (
        urlkit.with_canonical(base.unionByName(dups))
        .withColumn("url_h", urlkit.hash64(F.col("url_canon")))
        .withColumn("host", urlkit.host(F.col("url")))
        .dropDuplicates(["url_h"])
        .withColumn("kind", F.lit("overview"))
        .withColumn("depth", F.lit(1))
        .withColumn("priority", F.lit(1))
        .withColumn("listing_rank", F.col("doc_id").cast("int"))
        .withColumn("page_offset", F.lit(0))
    )
    rules = spark.createDataFrame(
        [("docs.example.com", ["/private"], None)],
        "host string, disallow_prefix array<string>, crawl_delay_ms int",
    )
    budgets = spark.createDataFrame(
        [("docs.example.com", 4.0, 4)], "host string, max_rps double, burst int"
    )
    cand = robots.allowed(frontier, rules)
    cand = polite.attach_budget(cand, budgets)
    ranked = sched.rank(cand)
    scheduled = polite.schedule(ranked)
    keyed = sched.with_canonical_key(scheduled)
    out = sched.assign_global_seq(keyed)
    return out.select(
        "crawl_seq", "url_canon", "url_h", "host", "kind", "fetched_at"
    )


# The driver's correctness harness checks exactly the FIRST 50 entries of
# queries() in iteration order (VERDICT r3 "Missing #1").  The window is
# SELF-MAINTAINING (VERDICT r4 "Next #1"): it is computed from the recorded
# CORRECTNESS_r{N}.json files committed at the repo root — each key's last
# driver-checked round — so each round's window is {never-checked keys} ∪
# {keys with the oldest driver rows}, least-recently-checked first.  With a
# registry of ≤ 2×50 keys this guarantees max driver-row staleness of one
# round with zero hand edits: whatever rotates out this round was checked
# THIS round's predecessor and rotates back in next round (guard-tested in
# tests/unit/test_entry_contract.py).  Keys past position 50 stay registered
# and are value-checked by scripts/check_oracle.py (a strictly stronger
# normalized-frame comparison) every round regardless.
_WINDOW_SIZE = 50


def _last_driver_rounds(here: str = _HERE) -> dict[str, int]:
    """key -> latest round with a recorded driver CORRECTNESS row (absent =
    never checked).  Reads the driver-written CORRECTNESS_r*.json records;
    unreadable files are skipped so a fresh checkout degrades to 'everything
    is new' rather than failing the import."""
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m is None:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rec = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rec, dict):
            continue
        for key in rec:
            last[key] = max(last.get(key, 0), rnd)
    return last


def _registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from crawlspark import pipeline_queries
    from crawlspark import queries as q

    full: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    full.update(q.QUERIES)
    full.update(pipeline_queries.QUERIES)
    return full


_LAST_DRIVER_ROUND = _last_driver_rounds()
_DRIVER_WINDOW_FIRST = sorted(
    _registry(), key=lambda k: (_LAST_DRIVER_ROUND.get(k, 0), k)
)[:_WINDOW_SIZE]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (q01-q24
    relational suite) plus the training-data pipeline operators (q30+),
    ordered so the driver's 50-key correctness window covers the keys that
    most need a fresh driver row (see _DRIVER_WINDOW_FIRST)."""
    full = _registry()
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for key in _DRIVER_WINDOW_FIRST:
        out[key] = full.pop(key)
    out.update(full)  # remaining veterans, original relative order
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per key; keys absent here (xxhash64-based
    sketches, binary multimodal plumbing) get the driver's rows-only check."""
    from crawlspark import pipeline_queries
    from crawlspark import queries as q

    out: dict[str, str] = {}
    out.update(q.ORACLE)
    out.update(pipeline_queries.ORACLE)
    return out
