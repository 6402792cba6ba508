"""Per-round benchmark: headline queries + the north-rule frontier pipeline.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] (default 32) and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "frontier": {...}, "scaling": {...}}

The frontier benchmark is the BASELINE.json metric: URLs scheduled+deduped
per second through canonicalize -> xxhash64 -> dedup -> robots -> budgets ->
salted top-k rank -> token-bucket schedule -> global crawl_seq.  The
north rule's two-cluster-size criterion is evidenced by running the same
pipeline at local[8] and local[cpus] and reporting scaling efficiency
(no real cluster in this sandbox — see BENCH/BASELINE.md).
Set SPARK_GRAFT_SCALING=0 to skip the second (local[8]) run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

HEADLINE = [
    "q02_scan_filter",
    "q09_left_anti_dedup",
    "q12_inner_join",
    "q14_groupby_agg",
    "q16_window_rank",
    "q18_topk_per_group",
    "q19_global_order",
    "q30_dedup_exact",
    "q31_jaccard_shingles",
    "q34_ann_cosine",
    "q36_quality_score",
    "q38_fingerprint",
]


def materialize(df) -> int:
    return df.count()


def synth_frontier(spark, n_urls: int, n_hosts: int = 100, dup_frac: float = 0.2):
    """Raw (uncanonical) URL frontier, deterministic from spark.range:
    ~dup_frac of rows are duplicate URLs in disguise (fragment/case noise),
    10% of traffic on one hot host (skew), 5% robots-blocked paths."""
    base = int(n_urls * (1 - dup_frac))
    df = spark.range(n_urls).select(
        F.col("id"), F.pmod(F.col("id"), F.lit(base)).alias("uid")
    )
    host = F.when(
        F.pmod(F.col("uid"), F.lit(10)) == 0, F.lit("hot.example.com")
    ).otherwise(
        F.concat(
            F.lit("h"), F.pmod(F.col("uid"), F.lit(n_hosts)).cast("string"), F.lit(".example.com")
        )
    )
    path = F.when(F.pmod(F.col("uid"), F.lit(20)) == 19, F.lit("/private/")).otherwise(
        F.lit("/Hotel_Review-d")
    )
    raw = F.concat(
        F.lit("HTTPS://"),
        F.when(F.col("id") >= base, F.upper(host)).otherwise(host),
        F.lit(":443"),
        path,
        F.col("uid").cast("string"),
        F.lit(".html?b=2&utm_source=feed&a=1"),
        F.when(F.col("id") >= base, F.lit("#dup")).otherwise(F.lit("")),
    )
    return df.select(F.col("uid"), raw.alias("url"))


def bench_frontier(spark, n_urls: int, take_k: int | None = 2000):
    """One full scheduling wave; returns (sec, urls_in, urls_scheduled)."""
    from crawlspark import polite, robots, sched, urlkit

    n_hosts = 100
    rules = spark.createDataFrame(
        [(f"h{i}.example.com", ["/private"], None) for i in range(n_hosts)]
        + [("hot.example.com", ["/private"], 100)],
        "host string, disallow_prefix array<string>, crawl_delay_ms int",
    )
    budgets = spark.createDataFrame(
        [(f"h{i}.example.com", 2.0, 4) for i in range(n_hosts)]
        + [("hot.example.com", 0.5, 4)],
        "host string, max_rps double, burst int",
    )
    t0 = time.time()
    fr = synth_frontier(spark, n_urls)
    fr = (
        fr.withColumn("url_canon", urlkit.canonicalize(F.col("url")))
        .withColumn("url_h", urlkit.hash64(F.col("url_canon")))
        .withColumn("host", urlkit.host(F.col("url")))
        .dropDuplicates(["url_h"])
    )
    cand = robots.allowed(fr, rules)
    cand = polite.attach_budget(cand, budgets)
    cand = (
        cand.withColumn("kind", F.lit("overview"))
        .withColumn("priority", F.lit(1))
        .withColumn("depth", F.lit(1))
        .withColumn("listing_rank", F.col("uid").cast("int"))
        .withColumn("page_offset", F.lit(0))
    )
    if take_k:
        batch = sched.rank_topk_salted(cand, take_k)
    else:
        batch = sched.rank(cand)
    batch = polite.schedule(batch)
    keyed = sched.with_canonical_key(batch)
    out = sched.assign_global_seq(keyed)
    n_sched = out.count()
    sec = time.time() - t0
    return sec, n_urls, n_sched


def run_queries(spark, sf_dir):
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    secs = {}
    for k in HEADLINE:
        t0 = time.time()
        materialize(qs[k](spark, sf_dir))
        secs[k] = round(time.time() - t0, 3)
    return secs


def main():
    from crawlspark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1])
    n_urls = max(100_000, int(10_000_000 * sf))

    spark = get_spark(parallelism=cpus, app_name="crawlspark-bench")
    q_secs = run_queries(spark, sf_dir)
    f_sec, f_in, f_out = bench_frontier(spark, n_urls)
    thr_big = f_in / f_sec
    spark.stop()

    scaling = {}
    if os.environ.get("SPARK_GRAFT_SCALING", "1") != "0" and cpus > 8:
        spark8 = get_spark(parallelism=8, app_name="crawlspark-bench-8")
        f_sec8, f_in8, _ = bench_frontier(spark8, n_urls)
        spark8.stop()
        thr_small = f_in8 / f_sec8
        scaling = {
            "cores_small": 8,
            "cores_big": cpus,
            "urls_per_sec_small": round(thr_small, 1),
            "urls_per_sec_big": round(thr_big, 1),
            "efficiency": round((thr_big / thr_small) / (cpus / 8), 3),
        }

    total = round(sum(q_secs.values()) + f_sec, 3)
    print(
        json.dumps(
            {
                "metric": "frontier throughput (URLs scheduled+deduped/sec) + headline query suite",
                "value": total,
                "unit": "sec",
                "queries": q_secs,
                "sf": sf,
                "frontier": {
                    "n_urls_in": f_in,
                    "n_scheduled": f_out,
                    "sec": round(f_sec, 3),
                    "urls_per_sec": round(thr_big, 1),
                    "take_k_per_host": 2000,
                },
                "scaling": scaling,
            }
        )
    )


if __name__ == "__main__":
    main()
