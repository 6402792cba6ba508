"""Crawl metrics (SURVEY.md §2 F1/F3/F5, I3/I4, K3): per-host/per-wave fetch
counts, per-partition lineage, rollups, windowed rates.  All hash aggregates
with automatic partial (map-side) combine."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def wave_stats(crawl_log: DataFrame) -> DataFrame:
    return crawl_log.groupBy("host", "wave").agg(
        F.count("*").alias("n_fetched"),
        F.countDistinct("url_h").alias("n_distinct"),
        F.min("fetched_at").alias("first_fetch"),
        F.max("fetched_at").alias("last_fetch"),
    )


def partition_lineage(crawl_log: DataFrame) -> DataFrame:
    """K3: per-partition fetch counts (BASELINE.json:6 lineage metrics)."""
    return crawl_log.groupBy("wave", "partition_id").agg(
        F.count("*").alias("n_fetched"), F.countDistinct("host").alias("n_hosts")
    )


def rollup_stats(crawl_log: DataFrame) -> DataFrame:
    return crawl_log.rollup("host", "kind").agg(F.count("*").alias("n"))


def totals(crawl_log: DataFrame) -> DataFrame:
    return crawl_log.agg(
        F.count("*").alias("n_fetched"),
        F.countDistinct("url_h").alias("n_urls"),
        F.countDistinct("host").alias("n_hosts"),
    )


def by_window(crawl_log: DataFrame, duration: str = "1 minute") -> DataFrame:
    """I3 tumbling-window fetch rate over the virtual clock."""
    return crawl_log.groupBy(F.window("fetched_at", duration).alias("w"), "host").agg(
        F.count("*").alias("n_fetched")
    )


def sessions(crawl_log: DataFrame, gap: str = "30 seconds") -> DataFrame:
    """I4 session windows: per-host fetch bursts separated by >= gap."""
    return crawl_log.groupBy(
        F.session_window("fetched_at", gap).alias("s"), "host"
    ).agg(F.count("*").alias("n_fetched"))
