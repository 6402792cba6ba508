"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``crawlspark/``; this module only adapts it to the
driver's (spark, sf_dir) -> DataFrame calling convention.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


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
        base.unionByName(dups)
        .withColumn("url_canon", urlkit.canonicalize(F.col("url")))
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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (q01-q24
    relational suite) plus the training-data pipeline operators (q30+)."""
    from crawlspark import pipeline_queries
    from crawlspark import queries as q

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(q.QUERIES)
    out.update(pipeline_queries.QUERIES)
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
