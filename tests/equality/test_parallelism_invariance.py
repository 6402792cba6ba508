"""Crawl order must be identical at any parallelism (SURVEY.md §5.3.2):
the canonical order is a pure sort key, never execution order.  The second
parallelism level runs in a subprocess because one process holds one local
SparkContext."""

from __future__ import annotations

import json
import subprocess
import sys

N_HOTELS = 40

SNIPPET = r"""
import sys, json, tempfile, shutil
sys.path.insert(0, "/root/repo")
from crawlspark.session import get_spark
from crawlspark.engine import CrawlEngine, EngineConfig
spark = get_spark(parallelism=int(sys.argv[1]), shuffle_partitions=int(sys.argv[1]))
d = tempfile.mkdtemp()
try:
    eng = CrawlEngine(spark, EngineConfig(n_hotels=%d), d)
    eng.run()
    log = eng.crawl_log()
    order = [r["url"] for r in log.orderBy("crawl_seq").select("url").collect()]
    print("ORDER_JSON:" + json.dumps(order))
finally:
    shutil.rmtree(d, ignore_errors=True)
""" % N_HOTELS


def _order_at(cores: int) -> list[str]:
    out = subprocess.run(
        [sys.executable, "-c", SNIPPET, str(cores)],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("ORDER_JSON:")][0]
    return json.loads(line[len("ORDER_JSON:"):])


def test_crawl_order_invariant_across_parallelism():
    o8 = _order_at(8)
    o32 = _order_at(32)
    assert o8 == o32
    assert len(o8) > 0
