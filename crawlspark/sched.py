"""Priority scheduler (SURVEY.md §2 G1-G4): the Spark SQL priority queue that
replaces the reference's implicit sequential loop order.

Ordering is ALWAYS a pure sort key — (priority, depth, listing_rank,
page_offset, url_h) per host for scheduling, and the canonical global key
(phase, listing_rank, depth, page_offset, host, url_h) for crawl_seq — never
execution order, never monotonically_increasing_id.  That is what makes a
distributed engine reproduce the sequential reference's exact crawl ordering
(BASELINE.json:6,14) at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HOST_ORDER = ["priority", "depth", "listing_rank", "page_offset", "url_h"]

# Canonical global crawl order — reproduces the reference's sequential loop:
# all listing pages in oa order (host tie-break), then per seed rank each
# hotel's overview then its review pages in or order.
CANONICAL_ORDER_COLS = ["ord_phase", "listing_rank", "depth", "page_offset", "host", "url_h"]


def with_canonical_key(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "ord_phase", F.when(F.col("kind") == "listing", F.lit(0)).otherwise(F.lit(1))
    )


def rank(df: DataFrame) -> DataFrame:
    """Per-host priority rank (G1): listing-depth priority first
    (BASELINE.json:6 'listing pages before review-detail pages')."""
    w = Window.partitionBy("host").orderBy(*HOST_ORDER)
    return df.withColumn("host_rank", F.row_number().over(w))


def take(df: DataFrame, k: int | None) -> DataFrame:
    """Top-k per host per wave (G3) — a rank filter, never a global
    sort+limit, so parallelism is preserved."""
    if k is None:
        return df
    return df.filter(F.col("host_rank") <= k)


def dedup_rank_topk_fused(
    df: DataFrame, k: int, salt_buckets: int = 32, dedup_tiebreak: str = "url"
) -> DataFrame:
    """Exact-dedup + skew-proof per-host top-k in ONE shuffle.

    A url_h-keyed dropDuplicates followed by a (host, salt) rank costs two
    shuffles; but same url_h implies same host+salt (salt = pmod(url_h, S)),
    so one repartition on (host, salt) lets BOTH windows run shuffle-free:
    HashPartitioning(host, salt) satisfies the clustering requirement of the
    (host, salt, url_h) dedup window AND the (host, salt) phase-1 rank —
    Spark inserts only local sorts.  Phase 2 re-ranks the <= S*k survivors
    per host exactly (same argument as rank_topk_salted).

    The kept duplicate is the minimum dedup_tiebreak row — a pure sort key,
    so the result is identical at any parallelism."""
    salted = df.withColumn(
        "_salt", F.pmod(F.col("url_h"), F.lit(salt_buckets)).cast("int")
    ).repartition(F.col("host"), F.col("_salt"))
    w_dedup = Window.partitionBy("host", "_salt", "url_h").orderBy(dedup_tiebreak)
    w1 = Window.partitionBy("host", "_salt").orderBy(*HOST_ORDER)
    survivors = (
        salted.withColumn("_dup", F.row_number().over(w_dedup))
        .filter(F.col("_dup") == 1)
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_dup", "_r1", "_salt")
    )
    w2 = Window.partitionBy("host").orderBy(*HOST_ORDER)
    return survivors.withColumn("host_rank", F.row_number().over(w2)).filter(
        F.col("host_rank") <= k
    )


def rank_topk_salted(df: DataFrame, k: int, salt_buckets: int = 32) -> DataFrame:
    """Skew-proof exact per-host top-k (G1+G3 fused for hot hosts).

    A plain Window.partitionBy(host) puts a 10^9-row hot host into ONE task.
    Two-phase instead: (1) rank within (host, salt) — salt from url_h, so
    every partition is ~1/S of the host — keep local rank <= k; (2) exactly
    re-rank the <= S*k survivors per host.  Same result as rank()+take(k)
    for any k (each host's true top-k survives phase 1: a row dropped in
    phase 1 has k better rows in its own salt bucket alone), but the big
    window never sees more than max(n_host/S, S*k) rows per task."""
    salted = df.withColumn(
        "_salt", F.pmod(F.col("url_h"), F.lit(salt_buckets)).cast("int")
    )
    w1 = Window.partitionBy("host", "_salt").orderBy(*HOST_ORDER)
    survivors = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_r1", "_salt")
    )
    w2 = Window.partitionBy("host").orderBy(*HOST_ORDER)
    return (
        survivors.withColumn("host_rank", F.row_number().over(w2))
        .filter(F.col("host_rank") <= k)
    )


def assign_global_seq(
    df: DataFrame, order_cols=None, seq_col: str = "crawl_seq", num_parts: int | None = None
) -> DataFrame:
    """Deterministic, scalable global sequence assignment (G4).

    A naive row_number over a global Window funnels everything through one
    partition; instead: range-partition + sort by the key (each partition
    holds a contiguous key range), then per-partition row_number plus a
    broadcast map of partition-start offsets.  Two jobs, no single-partition
    stage — survives a 100× scale-up."""
    order_cols = order_cols or CANONICAL_ORDER_COLS
    spark = df.sparkSession
    parts = num_parts or spark.sparkContext.defaultParallelism
    oc = [F.col(c) for c in order_cols]
    # localCheckpoint pins ONE sampling of the range partitioner for both
    # jobs (the partitioner is sampled, so an unpinned recompute could
    # re-bucket rows) AND leaves no session-lifetime cache behind — a
    # persist() here would leak a cached frame per call (the blocks of a
    # localCheckpoint are dropped by the ContextCleaner once the frame is
    # garbage-collected)
    d = (
        df.repartitionByRange(parts, *oc)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    # partition-start offsets: cumsum over the per-partition counts — the
    # only single-partition stage, bounded by the partition COUNT (<= parts
    # rows), never by the data
    counts = d.groupBy("_pid").agg(F.count("*").alias("_c"))
    w0 = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_c").over(w0), F.lit(0)).alias("_off")
    )
    w = Window.partitionBy("_pid").orderBy(*oc)
    return (
        d.join(F.broadcast(offsets), "_pid")
        .withColumn(seq_col, (F.col("_off") + F.row_number().over(w)).cast("long"))
        .drop("_pid", "_off")
    )
