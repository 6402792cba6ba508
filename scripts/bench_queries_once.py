"""One fresh-process leg of the headline query suite (bench.py's
run_queries) — the unit of the quiet-window best-of-N record in
BENCH/BASELINE.md §4.  Fresh JVM per leg (same-process reuse inherits warm
JIT), interleave legs, take per-query minimums across legs.

Usage: python scripts/bench_queries_once.py [sf_dir] [cores]
Prints one JSON line {"queries": {...}, "sf_dir": ..., "cores": ...}.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import bench
    from crawlspark.session import get_spark

    spark = get_spark(parallelism=cores, app_name="crawlspark-qbench")
    secs = bench.run_queries(spark, sf_dir)
    print(json.dumps({"queries": secs, "sf_dir": sf_dir, "cores": cores}))
    spark.stop()


if __name__ == "__main__":
    main()
