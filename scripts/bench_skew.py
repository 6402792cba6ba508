"""Degenerate shingle-skew microbench: jaccard_pairs skew="window" vs
"twolevel" on a synthetic corpus where ONE boilerplate shingle appears in
every document (the viral 'all rights reserved' case, VERDICT r3 item #5).

The corpus: n_docs documents of the form
    "common boilerplate phrase <unique tail words>"
so the 3-shingle over the boilerplate head occurs n_docs times — at
n_docs=10^6 the "window" mode routes 10^6 narrow rows through ONE WindowExec
task (the documented straggler), while "twolevel" shards the count through
map-side partial aggregation at the price of one extra exchange + join.

Usage:  python scripts/bench_skew.py <mode> <cores> <n_docs>
        (one leg per process — same discipline as bench.py --frontier:
        fresh JVM per leg, interleave legs, best-of-N; see BENCH/BASELINE.md
        §5 on the host's external CPU steal)
Prints one JSON line {"mode", "cores", "n_docs", "sec", "n_pairs"}.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main(mode: str, cores: int, n_docs: int) -> None:
    from pyspark.sql import functions as F

    from crawlspark import dedup
    from crawlspark.session import get_spark

    spark = get_spark(parallelism=cores, shuffle_partitions=cores)
    # every doc shares the boilerplate head; tails are unique so no pairs
    # survive the threshold — the measured cost is pure candidate machinery
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("common boilerplate phrase every page repeats verbatim "),
            F.lit("u"),
            F.col("id").cast("string"),
            F.lit(" v"),
            (F.col("id") * 7).cast("string"),
            F.lit(" w"),
            (F.col("id") * 13).cast("string"),
        ).alias("text"),
    )
    t0 = time.monotonic()
    n_pairs = dedup.jaccard_pairs(
        docs, n=3, max_df=20, threshold=0.3, skew=mode
    ).count()
    sec = time.monotonic() - t0
    print(
        json.dumps(
            {
                "mode": mode,
                "cores": cores,
                "n_docs": n_docs,
                "sec": round(sec, 3),
                "n_pairs": n_pairs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
