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


def parse_rules(raw: DataFrame) -> DataFrame:
    """Parse raw robots.txt bodies -> the structured rules table
    (host, disallow_prefix array<string>, crawl_delay_ms int).

    Input: (host, body) — one fetched robots.txt per host.  Grammar handled
    (RFC 9309 subset the reference crawler honors): `User-agent:` groups,
    `Disallow:` path prefixes, `Crawl-delay:` seconds; only groups that
    apply to `*` are kept; comments (#) and blank lines ignored; directive
    names case-insensitive.

    Pure native pipeline: posexplode the lines, number the user-agent
    GROUPS with a window cumsum over group-start markers (RFC 9309 §2.1:
    consecutive User-agent lines form ONE group and every rule below
    applies to ALL of them — a single forward-filled "current agent" would
    wrongly drop rules from stacked-UA groups where '*' is not last), keep
    the groups containing '*', then one aggregation per host.  Crawl-delay
    values are try_cast BEFORE the min (ANSI mode: a plain cast of a
    malformed value like '1.5s' would abort the whole job; and a string
    min would pick '10' over '2').  The result is the tiny broadcast
    dimension `annotate` consumes."""
    from pyspark.sql import Window

    lines = raw.select(
        "host", F.posexplode(F.split(F.col("body"), r"\r?\n")).alias("ln", "line")
    ).withColumn(
        "line", F.trim(F.regexp_replace(F.col("line"), r"#.*", ""))
    ).filter(F.col("line") != "")
    key = F.lower(F.trim(F.substring_index(F.col("line"), ":", 1)))
    val = F.trim(
        F.expr("substring(line, instr(line, ':') + 1, length(line))")
    )
    parsed = lines.select(
        "host", "ln", key.alias("key"), val.alias("value")
    ).filter(F.col("key").isin("user-agent", "disallow", "crawl-delay"))
    wln = Window.partitionBy("host").orderBy("ln")
    is_ua = (F.col("key") == "user-agent").cast("int")
    group_start = (
        is_ua
        * F.when(
            F.coalesce(F.lag("key").over(wln), F.lit("")) != "user-agent", 1
        ).otherwise(0)
    )
    grouped = parsed.withColumn(
        "grp",
        F.sum(group_start).over(
            wln.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    wgrp = Window.partitionBy("host", "grp")
    cur = grouped.withColumn(
        "star",
        F.max(
            ((F.col("key") == "user-agent") & (F.lower(F.col("value")) == "*")).cast(
                "int"
            )
        ).over(wgrp),
    ).filter((F.col("star") == 1) & (F.col("grp") > 0))
    delay_s = F.min(
        F.when(
            F.col("key") == "crawl-delay", F.col("value").try_cast("double")
        )
    )
    return (
        cur.groupBy("host")
        .agg(
            F.array_sort(
                F.collect_set(
                    F.when(
                        (F.col("key") == "disallow") & (F.col("value") != ""),
                        F.col("value"),
                    )
                )
            ).alias("disallow_prefix"),
            (delay_s * 1000).cast("int").alias("crawl_delay_ms"),
        )
    )
