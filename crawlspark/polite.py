"""Per-host politeness as data, not sleep (SURVEY.md §2 E3/G2/G5).

The reference sleeps between sequential requests; the engine computes a
*virtual clock*: a token bucket per host (capacity `burst`, refill `rate`/s)
materialized as a scheduled-timestamp column.  The arithmetic is one shared
pure function — tests/oracle_ref.py:token_bucket_offset implements the same
formula for the sequential oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BASE_TS = "2024-01-01 00:00:00"  # virtual clock epoch (FIXTURES.md §6)


def attach_budget(df: DataFrame, budgets: DataFrame) -> DataFrame:
    """Broadcast-join per-host budgets; effective rate folds in any robots
    crawl-delay already annotated on the frontier (column crawl_delay_ms)."""
    out = df.join(F.broadcast(budgets.select("host", "max_rps", "burst")), "host", "left")
    out = out.withColumn("max_rps", F.coalesce(F.col("max_rps"), F.lit(2.0))).withColumn(
        "burst", F.coalesce(F.col("burst"), F.lit(1))
    )
    if "crawl_delay_ms" in df.columns:
        out = out.withColumn(
            "eff_rate",
            F.when(
                F.col("crawl_delay_ms").isNotNull(),
                F.least(F.col("max_rps"), F.lit(1000.0) / F.col("crawl_delay_ms")),
            ).otherwise(F.col("max_rps")),
        )
    else:
        out = out.withColumn("eff_rate", F.col("max_rps"))
    return out


def token_bucket_offset_col(n, rate, burst):
    """Seconds offset of the n-th (0-based) fetch on a host — the IDENTICAL
    formula the frozen oracle uses (first `burst` free, then 1/rate each)."""
    return F.when(n < burst, F.lit(0.0)).otherwise((n - burst + 1) / rate)


def schedule(ranked: DataFrame, prior_counts: DataFrame | None = None) -> DataFrame:
    """Assign each ranked row its virtual fetch timestamp.

    `ranked` must carry host_rank (1-based per-host rank from sched.rank) and
    eff_rate/burst from attach_budget.  `prior_counts` is the per-host number
    of fetches in earlier waves (host, n_prior) so the bucket clock is
    continuous across waves."""
    df = ranked
    if prior_counts is not None:
        df = df.join(F.broadcast(prior_counts), "host", "left").withColumn(
            "n_prior", F.coalesce(F.col("n_prior"), F.lit(0))
        )
    else:
        df = df.withColumn("n_prior", F.lit(0))
    n = F.col("n_prior") + F.col("host_rank") - 1
    off = token_bucket_offset_col(n, F.col("eff_rate"), F.col("burst"))
    return df.withColumn(
        "fetched_at",
        F.timestamp_add(
            "MICROSECOND", F.round(off * 1e6).cast("long"), F.lit(BASE_TS).cast("timestamp")
        ),
    ).drop("n_prior")


def audit(crawl_log: DataFrame, budgets: DataFrame) -> DataFrame:
    """G5 lag/lead audit: per host, the inter-fetch gap beyond the burst
    window must be >= 1/eff_rate.  Returns rows with gap_us and ok flag."""
    w = Window.partitionBy("host").orderBy("fetched_at", "url_h")
    df = crawl_log.withColumn("prev_ts", F.lag("fetched_at").over(w)).withColumn(
        "host_seq", F.row_number().over(w)
    )
    df = attach_budget(df, budgets)
    gap_us = F.unix_micros(F.col("fetched_at")) - F.unix_micros(F.col("prev_ts"))
    ok = (
        F.col("prev_ts").isNull()
        | (F.col("host_seq") <= F.col("burst"))
        | (gap_us + 1 >= F.lit(1e6) / F.col("eff_rate"))
    )
    return df.withColumn("gap_us", gap_us).withColumn("ok", ok)
