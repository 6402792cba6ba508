"""Relational operator suite over the driver's testdata tables.

One function per oracle key of SURVEY.md §2 (q01-q24).  Each takes
``(spark, sf_dir)`` and returns a DataFrame; ``ORACLE`` maps the same key to
the ANSI-SQL string DuckDB runs on the identical parquet for the driver's
row-count + schema + value-hash comparison (__spark_entry__.py contract).

Parity rules (why these queries hash-match bit-for-bit):
- every computed column is aliased identically on both sides;
- both engines see the same parquet bytes, so integer/string operands are
  identical; double results of the same IEEE ops on identical operands are
  bit-equal — we still ``round()`` money aggregates to keep the comparison
  robust to summation-order differences in floating-point aggregation;
- ordering never matters (driver hash is order-insensitive) except where a
  LIMIT/top-k truncates — those carry a total deterministic sort key.

Scale notes are inline per query: broadcasts are explicit, top-k is a rank
filter (never a global sort+limit), and the global-sequence query q19 uses
sched.assign_global_seq (range-partition + offsets), not a single-partition
window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawlspark import sched, urlkit


def read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# --------------------------------------------------------------------- A/B: scans


def q01_scan_project(spark, sf_dir):
    return read(spark, sf_dir, "region").select("r_regionkey", "r_name")


def q02_scan_filter(spark, sf_dir):
    # predicate reaches the parquet scan (PushedFilters) — asserted in tests
    return (
        read(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") < "1997-01-01") & (F.col("l_quantity") > 30))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
    )


def q03_like_classify(spark, sf_dir):
    p = read(spark, sf_dir, "part")
    cls = (
        F.when(F.col("p_type").like("%ECO%"), F.lit("eco"))
        .when(F.col("p_type").like("%SMALL%"), F.lit("small"))
        .otherwise(F.lit("other"))
    )
    return (
        p.withColumn("type_class", cls)
        .groupBy("type_class")
        .agg(F.count("*").alias("n_parts"), F.round(F.avg("p_retailprice"), 2).alias("avg_price"))
    )


# ------------------------------------------------------------- C: scalar functions


def _doc_url(c_source, c_doc_id, c_n_chars):
    """Deterministic messy URL built from document columns — exercises every
    canonicalization rule (case, default port, tracking params, unsorted
    query, fragment, trailing slash, percent-escapes: %61 decodes to 'a',
    %2f must re-encode as %2F, %7E decodes to '~')."""
    return F.concat(
        F.lit("HTTPS://Docs.Example.COM:443/"),
        c_source,
        F.lit("/p%61ge%2f"),
        (c_doc_id % 10).cast("string"),
        F.lit("/%7Edoc?utm_source=x&b="),
        (c_n_chars % 7).cast("string"),
        F.lit("&a=1#frag"),
    )


def q04_canonicalize(spark, sf_dir):
    d = read(spark, sf_dir, "documents")
    df = d.withColumn(
        "url", _doc_url(F.col("source"), F.col("doc_id"), F.col("n_chars"))
    )
    # staged canonicalize (urlkit.with_canonical): identical values to the
    # expression form, ~5x less driver compile (CLAUDE.md composition trap)
    return urlkit.with_canonical(df).select(
        "doc_id",
        "url_canon",
        urlkit.host(F.col("url")).alias("host"),
    )


def q05_explode_sequence(spark, sf_dir):
    # pagination fanout: n_pages = ceil(n_chars/100); one row per page offset.
    # Guarded against n_pages == 0: Spark's sequence(0, -1) yields the
    # DESCENDING [0, -1], not empty (the sequence(1, 0) trap) — the oracle's
    # range(0, 0) is empty, so an empty doc must fan out to zero rows.
    d = read(spark, sf_dir, "documents")
    pages = F.when(
        F.col("n_pages") >= 1,
        F.sequence(F.lit(0).cast("long"), F.col("n_pages") - 1),
    ).otherwise(F.array().cast("array<long>"))
    return (
        d.withColumn("n_pages", F.ceil(F.col("n_chars") / F.lit(100.0)).cast("long"))
        .select("doc_id", F.explode(pages).alias("k"))
        .withColumn("page_offset", (F.col("k") * 100).cast("long"))
    )


def q06_date_trunc_agg(spark, sf_dir):
    e = read(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


def q07_json_extract(spark, sf_dir):
    e = read(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def q08_span_assembly(spark, sf_dir):
    # ordered reassembly: per source, docs ordered by doc_id, first 16 chars
    # each, joined — the span-order invariant (offset sort key) in miniature
    d = read(spark, sf_dir, "documents")
    return (
        d.select("source", "doc_id", F.substring("text", 1, 16).alias("frag"))
        .groupBy("source")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("doc_id", "frag"))),
                    lambda s: s["frag"],
                ),
                "|",
            ).alias("assembled"),
            F.count("*").alias("n_docs"),
        )
    )


# ----------------------------------------------------------------- D/E: dedup/join


def q09_left_anti_dedup(spark, sf_dir):
    o = read(spark, sf_dir, "orders")
    li = read(spark, sf_dir, "lineitem")
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_anti").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )


def q10_count_distinct(spark, sf_dir):
    e = read(spark, sf_dir, "events")
    return e.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
        F.count("*").alias("n_events"),
    )


def q11_broadcast_join(spark, sf_dir):
    n = read(spark, sf_dir, "nation")
    r = read(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_nations"))
    )


def q12_inner_join(spark, sf_dir):
    o = read(spark, sf_dir, "orders")
    c = read(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


def q13_left_semi(spark, sf_dir):
    c = read(spark, sf_dir, "customer")
    o = read(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# ------------------------------------------------------------------ F: aggregation


def q14_groupby_agg(spark, sf_dir):
    # TPC-H Q1 shape: partial (map-side) + final hash agg, no extra shuffle
    li = read(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.count("*").alias("count_order"),
    )


def q15_rollup(spark, sf_dir):
    e = read(spark, sf_dir, "events")
    return e.rollup("event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )


# --------------------------------------------------------------------- G: windows


def q16_window_rank(spark, sf_dir):
    e = read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "rn")
    )


def q17_cumsum_window(spark, sf_dir):
    e = read(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id", "event_id", F.round(F.sum("value").over(w), 4).alias("running_value")
    )


def q18_topk_per_group(spark, sf_dir):
    o = read(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


def q19_global_order(spark, sf_dir):
    # scalable global sequence: range-partition + per-partition row_number +
    # offset map (sched.assign_global_seq) — NOT a one-partition window
    o = read(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    out = sched.assign_global_seq(
        o, order_cols=["o_orderdate", "o_orderkey"], seq_col="seq"
    )
    return out.select("o_orderkey", "seq")


def q20_lag_gap(spark, sf_dir):
    e = read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tsc = F.col("ts").cast("timestamp")
    gap = F.unix_micros(tsc) - F.unix_micros(F.lag(tsc).over(w))
    return e.select(
        "user_id", "event_id", gap.alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())


# ------------------------------------------------------------- H: sort/limit/setop


def q21_sort_limit(spark, sf_dir):
    o = read(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


def q22_union_dedup(spark, sf_dir):
    o = read(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    c = read(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    return o.unionByName(c).distinct()


def q23_except(spark, sf_dir):
    # customers with no large order — non-trivial except set
    c = read(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = (
        read(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    return c.exceptAll(o.distinct())


def q24_intersect(spark, sf_dir):
    c = read(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = read(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return c.intersect(o)


def q25_asof_join(spark, sf_dir):
    """As-of join: for each event, the latest order of the same key at or
    before the event timestamp.  Implemented as the scalable
    union-sort-window idiom (ONE sort shuffle on the key, no range-join
    blowup): tag both streams, union, running max of the order-side
    timestamp."""
    o = read(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"), F.col("o_orderdate").alias("t"),
        F.lit(0).alias("is_q"), F.lit(None).cast("long").alias("event_id"),
    )
    e = read(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"), F.col("ts").alias("t"),
        F.lit(1).alias("is_q"), "event_id",
    )
    u = o.unionByName(e)
    w = (
        Window.partitionBy("k")
        .orderBy("t", "is_q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    asof = F.max(F.when(F.col("is_q") == 0, F.col("t"))).over(w)
    return (
        u.withColumn("asof_order_ts", asof)
        .filter((F.col("is_q") == 1) & F.col("asof_order_ts").isNotNull())
        .select("event_id", F.col("k").alias("user_id"), "asof_order_ts")
    )


def q26_cube(spark, sf_dir):
    e = read(spark, sf_dir, "events")
    return (
        e.withColumn("user_bucket", F.pmod(F.col("user_id"), F.lit(10)))
        .cube("event_type", "user_bucket")
        .agg(F.count("*").alias("n"))
    )


def q27_session_window(spark, sf_dir):
    # session windows per user: bursts separated by >= 30 min of quiet.
    # DuckDB has no session_window -> rows-only check; semantics unit-tested.
    e = read(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window(F.col("ts").cast("timestamp"), "30 minutes").alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("s.start").alias("session_start"), "user_id", "n_events")
    )


def q28_exists_subquery(spark, sf_dir):
    # EXISTS with a predicate -> left-semi join in Spark
    o = read(spark, sf_dir, "orders")
    li = read(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 48)
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_semi").select(
        "o_orderkey", "o_totalprice"
    )


def q29_scalar_subquery(spark, sf_dir):
    # orders above the global average price: scalar aggregate broadcast
    o = read(spark, sf_dir, "orders")
    avg_price = o.agg(F.avg("o_totalprice").alias("ap"))
    return (
        o.crossJoin(F.broadcast(avg_price))
        .filter(F.col("o_totalprice") > F.col("ap"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def q47_sessionize_lag(spark, sf_dir):
    """Gap-based sessionization WITHOUT session_window: session boundary =
    gap > 30 min; session_id = running count of boundaries per user.  The
    oracle-expressible twin of q27 (same semantics, lag + cumsum)."""
    e = read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.lag(F.col("ts").cast("timestamp")).over(w)
    )
    is_new = F.when(gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1).otherwise(0)
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = F.sum(is_new).over(wc)
    return (
        e.withColumn("session_id", sess)
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


def q48_three_table_topk(spark, sf_dir):
    """TPC-H Q3 shape — the suite's 3-table analytic join: customer ⋈ orders
    ⋈ lineitem with segment + date filters, per-order revenue aggregation,
    deterministic top-10.  The filtered customer side is dimension-scale
    (AQE broadcasts it from measured size — no forced hint, a web-scale
    customer table must be allowed to shuffle); orders ⋈ lineitem is the big
    fact-fact join and shuffles on the order key.  Top-10 compiles to
    TakeOrderedAndProject (per-partition heap + merge), never a full global
    sort."""
    c = read(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = read(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    li = read(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "o_orderdate", "o_orderpriority", "revenue")
    )


def q52_four_table_join(spark, sf_dir):
    """TPC-H Q10 shape — 4-table join: returned-lineitem revenue by nation.
    customer ⋈ orders ⋈ lineitem ⋈ nation; nation is a true dimension
    (explicit broadcast), the two fact joins shuffle on their keys and
    pre-aggregate map-side."""
    c = read(spark, sf_dir, "customer")
    o = read(spark, sf_dir, "orders")
    li = read(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = read(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


def q53_percentile_stats(spark, sf_dir):
    """Exact linear-interpolation percentiles of doc length per source — the
    quality-cutoff calibration step of a corpus pipeline (thresholds are set
    at percentiles, not absolute values).  Spark's percentile() and DuckDB's
    quantile_cont() share the interpolation, so values hash-match."""
    d = read(spark, sf_dir, "documents")
    pct = F.percentile(F.col("n_chars"), F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return (
        d.groupBy("source")
        .agg(pct.alias("p"), F.count("*").alias("n_docs"))
        .select(
            "source",
            "n_docs",
            F.round(F.element_at("p", 1), 4).alias("p50"),
            F.round(F.element_at("p", 2), 4).alias("p90"),
            F.round(F.element_at("p", 3), 4).alias("p99"),
        )
    )


QUERIES = {
    "q01_scan_project": q01_scan_project,
    "q02_scan_filter": q02_scan_filter,
    "q03_like_classify": q03_like_classify,
    "q04_canonicalize": q04_canonicalize,
    "q05_explode_sequence": q05_explode_sequence,
    "q06_date_trunc_agg": q06_date_trunc_agg,
    "q07_json_extract": q07_json_extract,
    "q08_span_assembly": q08_span_assembly,
    "q09_left_anti_dedup": q09_left_anti_dedup,
    "q10_count_distinct": q10_count_distinct,
    "q11_broadcast_join": q11_broadcast_join,
    "q12_inner_join": q12_inner_join,
    "q13_left_semi": q13_left_semi,
    "q14_groupby_agg": q14_groupby_agg,
    "q15_rollup": q15_rollup,
    "q16_window_rank": q16_window_rank,
    "q17_cumsum_window": q17_cumsum_window,
    "q18_topk_per_group": q18_topk_per_group,
    "q19_global_order": q19_global_order,
    "q20_lag_gap": q20_lag_gap,
    "q21_sort_limit": q21_sort_limit,
    "q22_union_dedup": q22_union_dedup,
    "q23_except": q23_except,
    "q24_intersect": q24_intersect,
    "q25_asof_join": q25_asof_join,
    "q26_cube": q26_cube,
    "q27_session_window": q27_session_window,
    "q28_exists_subquery": q28_exists_subquery,
    "q29_scalar_subquery": q29_scalar_subquery,
    "q47_sessionize_lag": q47_sessionize_lag,
    "q48_three_table_topk": q48_three_table_topk,
    "q52_four_table_join": q52_four_table_join,
    "q53_percentile_stats": q53_percentile_stats,
}

# DuckDB mirror of urlkit.canonicalize — token-for-token the same pipeline
# (strip fragment -> normalize percent-escapes (unreserved decoded, kept
# escapes upper-hexed) -> lower scheme/host -> drop default port -> trim
# trailing slash -> drop tracking params -> sort remaining query params).
_CANON_SQL = """
WITH u0 AS (
  SELECT doc_id,
         'HTTPS://Docs.Example.COM:443/' || source || '/p%61ge%2f' ||
         CAST(doc_id % 10 AS VARCHAR) || '/%7Edoc?utm_source=x&b=' ||
         CAST(n_chars % 7 AS VARCHAR) || '&a=1#frag' AS url
  FROM documents
), p0 AS (
  SELECT doc_id,
         regexp_replace(trim(url), '#.*', '') AS raw
  FROM u0
), parts AS (
  SELECT doc_id,
         string_split(raw, '%')[1] ||
         array_to_string(list_transform(string_split(raw, '%')[2:],
           p -> CASE
             WHEN regexp_matches(substr(p, 1, 2), '^[0-9A-Fa-f]{2}$') THEN
               CASE WHEN regexp_matches(
                      chr(CAST((strpos('0123456789ABCDEF', upper(substr(p, 1, 1))) - 1) * 16
                          + strpos('0123456789ABCDEF', upper(substr(p, 2, 1))) - 1 AS INTEGER)),
                      '^[A-Za-z0-9._~\\-]$')
                    THEN chr(CAST((strpos('0123456789ABCDEF', upper(substr(p, 1, 1))) - 1) * 16
                             + strpos('0123456789ABCDEF', upper(substr(p, 2, 1))) - 1 AS INTEGER))
                         || substr(p, 3)
                    ELSE '%' || upper(substr(p, 1, 2)) || substr(p, 3)
               END
             ELSE '%' || p
           END), '') AS u
  FROM p0
), comp AS (
  SELECT doc_id,
         lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS sch,
         lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]+)', 1)) AS hp,
         regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]+([^?#]*)', 1) AS rawpath,
         regexp_extract(u, '\\?([^#]*)', 1) AS rawq
  FROM parts
), comp2 AS (
  SELECT doc_id, sch,
         regexp_replace(hp, ':\\d+$', '') AS hst,
         regexp_extract(hp, ':(\\d+)$', 1) AS prt,
         CASE WHEN regexp_replace(rawpath, '/+$', '') = '' THEN '/'
              ELSE regexp_replace(rawpath, '/+$', '') END AS pth,
         array_to_string(
           list_sort(list_filter(string_split(rawq, '&'),
             x -> x <> '' AND NOT regexp_matches(x, '^(utm_[^=]*|ref|fbclid|gclid)='))),
           '&') AS q
  FROM comp
)
SELECT doc_id,
       sch || '://' || hst ||
       CASE WHEN prt <> '' AND NOT (sch = 'https' AND prt = '443')
                          AND NOT (sch = 'http' AND prt = '80')
            THEN ':' || prt ELSE '' END ||
       pth ||
       CASE WHEN q <> '' THEN '?' || q ELSE '' END AS url_canon,
       regexp_replace(lower(regexp_extract(regexp_replace(trim(url), '#.*', ''),
         '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]+)', 1)), ':\\d+$', '') AS host
FROM comp2 JOIN u0 USING (doc_id)
"""

ORACLE = {
    "q01_scan_project": "SELECT r_regionkey, r_name FROM region",
    "q02_scan_filter": (
        "SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate FROM lineitem "
        "WHERE l_shipdate < TIMESTAMP '1997-01-01' AND l_quantity > 30"
    ),
    "q03_like_classify": (
        "SELECT CASE WHEN p_type LIKE '%ECO%' THEN 'eco' "
        "WHEN p_type LIKE '%SMALL%' THEN 'small' ELSE 'other' END AS type_class, "
        "count(*) AS n_parts, round(avg(p_retailprice), 2) AS avg_price "
        "FROM part GROUP BY 1"
    ),
    "q04_canonicalize": _CANON_SQL,
    "q05_explode_sequence": (
        "SELECT doc_id, k, k * 100 AS page_offset FROM documents, "
        "unnest(range(0, CAST(ceil(n_chars / 100.0) AS BIGINT))) AS u(k)"
    ),
    "q06_date_trunc_agg": (
        "SELECT date_trunc('hour', ts) AS hour, count(*) AS n_events, "
        "round(sum(value), 2) AS sum_value FROM events GROUP BY 1"
    ),
    "q07_json_extract": (
        "SELECT event_type, count(*) AS n, "
        "CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, "
        "min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k, "
        "max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k "
        "FROM events GROUP BY 1"
    ),
    "q08_span_assembly": (
        "SELECT source, string_agg(substr(text, 1, 16), '|' ORDER BY doc_id) AS assembled, "
        "count(*) AS n_docs FROM documents GROUP BY source"
    ),
    "q09_left_anti_dedup": (
        "SELECT o_orderkey, o_custkey, o_orderstatus FROM orders "
        "WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)"
    ),
    "q10_count_distinct": (
        "SELECT count(DISTINCT user_id) AS n_users, "
        "count(DISTINCT event_type) AS n_types, count(*) AS n_events FROM events"
    ),
    "q11_broadcast_join": (
        "SELECT r_name, count(*) AS n_nations FROM nation "
        "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"
    ),
    "q12_inner_join": (
        "SELECT c_mktsegment, count(*) AS n_orders, "
        "round(sum(o_totalprice), 2) AS revenue FROM orders "
        "JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment"
    ),
    "q13_left_semi": (
        "SELECT c_custkey, c_name, c_mktsegment FROM customer "
        "WHERE c_custkey IN (SELECT o_custkey FROM orders)"
    ),
    "q14_groupby_agg": (
        "SELECT l_returnflag, l_linestatus, "
        "round(sum(l_quantity), 2) AS sum_qty, "
        "round(sum(l_extendedprice), 2) AS sum_base_price, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
        "round(avg(l_quantity), 4) AS avg_qty, "
        "count(*) AS count_order "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
        "GROUP BY l_returnflag, l_linestatus"
    ),
    "q15_rollup": (
        "SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value "
        "FROM events GROUP BY ROLLUP (event_type)"
    ),
    "q16_window_rank": (
        "SELECT user_id, event_id, rn FROM (SELECT user_id, event_id, "
        "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn "
        "FROM events) WHERE rn <= 3"
    ),
    "q17_cumsum_window": (
        "SELECT user_id, event_id, round(sum(value) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value "
        "FROM events"
    ),
    "q18_topk_per_group": (
        "SELECT o_custkey, o_orderkey, o_totalprice, rk FROM ("
        "SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER "
        "(PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk "
        "FROM orders) WHERE rk <= 2"
    ),
    "q19_global_order": (
        "SELECT o_orderkey, row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS seq "
        "FROM orders"
    ),
    "q20_lag_gap": (
        "SELECT user_id, event_id, gap_us FROM (SELECT user_id, event_id, "
        "epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) "
        "AS gap_us FROM events) WHERE gap_us IS NOT NULL"
    ),
    "q21_sort_limit": (
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
    ),
    "q22_union_dedup": (
        "SELECT o_custkey AS custkey FROM orders UNION "
        "SELECT c_custkey AS custkey FROM customer"
    ),
    "q23_except": (
        "SELECT c_custkey AS custkey FROM customer EXCEPT ALL "
        "SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000"
    ),
    "q24_intersect": (
        "SELECT c_custkey AS custkey FROM customer INTERSECT "
        "SELECT o_custkey AS custkey FROM orders"
    ),
    "q25_asof_join": (
        "SELECT event_id, user_id, asof_order_ts FROM ("
        "SELECT event_id, user_id, "
        "(SELECT max(o.o_orderdate) FROM orders o WHERE o.o_custkey = e.user_id "
        "AND o.o_orderdate <= e.ts) AS asof_order_ts FROM events e) "
        "WHERE asof_order_ts IS NOT NULL"
    ),
    "q26_cube": (
        "SELECT event_type, user_id % 10 AS user_bucket, count(*) AS n "
        "FROM events GROUP BY CUBE (event_type, user_bucket)"
    ),
    "q28_exists_subquery": (
        "SELECT o_orderkey, o_totalprice FROM orders o WHERE EXISTS ("
        "SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey "
        "AND l.l_quantity >= 48)"
    ),
    "q29_scalar_subquery": (
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
        "WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)"
    ),
    "q48_three_table_topk": (
        "SELECT l_orderkey, o_orderdate, o_orderpriority, revenue FROM ("
        "SELECT l_orderkey, o_orderdate, o_orderpriority, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON o_orderkey = l_orderkey "
        "WHERE c_mktsegment = 'BUILDING' "
        "AND o_orderdate < TIMESTAMP '1998-01-01' "
        "AND l_shipdate > TIMESTAMP '1998-01-01' "
        "GROUP BY l_orderkey, o_orderdate, o_orderpriority) "
        "ORDER BY revenue DESC, l_orderkey LIMIT 10"
    ),
    "q52_four_table_join": (
        "SELECT n_name, count(*) AS n_items, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON o_orderkey = l_orderkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "WHERE l_returnflag = 'R' GROUP BY n_name"
    ),
    "q53_percentile_stats": (
        "SELECT source, count(*) AS n_docs, "
        "round(quantile_cont(n_chars, 0.5), 4) AS p50, "
        "round(quantile_cont(n_chars, 0.9), 4) AS p90, "
        "round(quantile_cont(n_chars, 0.99), 4) AS p99 "
        "FROM documents GROUP BY source"
    ),
    "q47_sessionize_lag": (
        "WITH g AS (SELECT user_id, event_id, ts, "
        "epoch_us(ts) - epoch_us(lag(ts) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us FROM events), "
        "s AS (SELECT user_id, event_id, ts, "
        "CAST(sum(CASE WHEN gap_us IS NULL OR gap_us > 30*60*1000000 THEN 1 ELSE 0 END) "
        "OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM g) "
        "SELECT user_id, session_id, count(*) AS n_events, "
        "min(ts) AS session_start, max(ts) AS session_end "
        "FROM s GROUP BY user_id, session_id"
    ),
}
