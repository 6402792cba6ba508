"""robots.txt enforcement (SURVEY.md §2 E2, BASELINE.json:6,14).

Rules are a tiny per-host dimension — broadcast-joined, never shuffled.  The
prefix match runs inside a higher-order function (``exists``) so it stays
JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def url_path_col(url):
    return F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+([^?#]*)", 1)


def annotate(frontier: DataFrame, rules: DataFrame) -> DataFrame:
    """Attach `blocked` (robots disallow) and `crawl_delay_ms` columns."""
    r = F.broadcast(rules.select("host", "disallow_prefix", "crawl_delay_ms"))
    df = frontier.join(r, "host", "left")
    path = url_path_col(F.col("url"))
    blocked = F.when(
        F.col("disallow_prefix").isNull(), F.lit(False)
    ).otherwise(F.exists(F.col("disallow_prefix"), lambda p: path.startswith(p)))
    return df.withColumn("blocked", blocked).drop("disallow_prefix")


def allowed(frontier: DataFrame, rules: DataFrame) -> DataFrame:
    return annotate(frontier, rules).filter(~F.col("blocked")).drop("blocked")
