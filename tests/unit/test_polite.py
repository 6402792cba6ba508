"""Politeness-budget unit tests: the robots crawl-delay cap on the token
bucket (untested elsewhere — fixtures use null delays) and the audit's
violation detection."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from crawlspark import polite


def _ranked(spark, rows):
    return spark.createDataFrame(
        rows, "host string, url_h long, host_rank int, crawl_delay_ms int"
    )


def test_crawl_delay_caps_effective_rate(spark):
    budgets = spark.createDataFrame(
        [("slow.com", 4.0, 1), ("fast.com", 4.0, 1)], "host string, max_rps double, burst int"
    )
    rows = [("slow.com", i, i + 1, 500) for i in range(4)] + [
        ("fast.com", 100 + i, i + 1, None) for i in range(4)
    ]
    out = polite.schedule(polite.attach_budget(_ranked(spark, rows), budgets))
    eff = {r["host"]: r["eff_rate"] for r in out.collect()}
    # 500 ms crawl-delay -> 2 rps, tighter than the 4 rps budget; null delay
    # keeps the budget rate
    assert eff["slow.com"] == 2.0 and eff["fast.com"] == 4.0
    ts = {
        (r["host"], r["host_rank"]): r["fetched_at"] for r in out.collect()
    }
    gap_slow = (ts[("slow.com", 3)] - ts[("slow.com", 2)]).total_seconds()
    gap_fast = (ts[("fast.com", 3)] - ts[("fast.com", 2)]).total_seconds()
    assert abs(gap_slow - 0.5) < 1e-6  # 1/2 rps
    assert abs(gap_fast - 0.25) < 1e-6  # 1/4 rps


def test_audit_flags_budget_violation(spark):
    budgets = spark.createDataFrame(
        [("h.com", 2.0, 1)], "host string, max_rps double, burst int"
    )
    base = dt.datetime(2024, 1, 1)
    # rank-2 fetch only 100 ms after rank-1: violates 1/2 rps (>= 500 ms)
    log = spark.createDataFrame(
        [
            ("h.com", 1, base),
            ("h.com", 2, base + dt.timedelta(milliseconds=100)),
            ("h.com", 3, base + dt.timedelta(milliseconds=700)),
        ],
        "host string, url_h long, fetched_at timestamp",
    )
    audited = {r["url_h"]: r["ok"] for r in polite.audit(log, budgets).collect()}
    assert audited[1] is True      # burst head
    assert audited[2] is False     # 100 ms < 500 ms
    assert audited[3] is True      # 600 ms >= 500 ms
