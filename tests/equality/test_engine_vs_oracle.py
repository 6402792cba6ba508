"""Engine ⇄ frozen-oracle equality (SURVEY.md §5.3.2, BASELINE.json:14):
exact crawl ordering, final URL-seen set, and per-row span sequences, under
the same seed list and politeness budget — across seen-set implementations,
fetch implementations, and a kill/resume."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from crawlspark.engine import CrawlEngine, EngineConfig
from oracle_ref import run_oracle

N_HOTELS = 100


@pytest.fixture(scope="module")
def oracle():
    return run_oracle(N_HOTELS)


def _run_engine(spark, cfg):
    d = tempfile.mkdtemp(prefix="crawlspark_eq_")
    try:
        eng = CrawlEngine(spark, cfg, d)
        eng.run()
        log = eng.crawl_log()
        order = [
            (r["crawl_seq"], r["url"])
            for r in log.orderBy("crawl_seq").select("crawl_seq", "url").collect()
        ]
        seen = {r["url_h"] for r in log.select("url_h").collect()}
        docs = {
            r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
            for r in eng.documents().collect()
        }
        return order, seen, docs, eng
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _assert_equal(oracle, order, seen, docs):
    assert order == oracle.crawl_order
    assert seen == oracle.seen
    assert docs == oracle.documents


def test_exact_mode(spark, oracle):
    order, seen, docs, _ = _run_engine(spark, EngineConfig(n_hotels=N_HOTELS, seen_mode="exact"))
    _assert_equal(oracle, order, seen, docs)


def test_bloom_mode(spark, oracle):
    order, seen, docs, _ = _run_engine(
        spark, EngineConfig(n_hotels=N_HOTELS, seen_mode="bloom", bloom_partitions=16)
    )
    _assert_equal(oracle, order, seen, docs)


def test_pandas_fetch_path(spark, oracle):
    """J2: the pandas-UDF fetch path produces identical output to the native
    expression path."""
    order, seen, docs, _ = _run_engine(
        spark, EngineConfig(n_hotels=N_HOTELS, use_pandas_fetch=True)
    )
    _assert_equal(oracle, order, seen, docs)


def test_kill_and_resume(spark, oracle):
    """A6: stop after one wave; a NEW engine instance resumes from the last
    committed manifest and the final output is identical."""
    d = tempfile.mkdtemp(prefix="crawlspark_resume_")
    try:
        cfg = EngineConfig(n_hotels=N_HOTELS)
        eng1 = CrawlEngine(spark, cfg, d)
        eng1.bootstrap()
        assert eng1.step()  # wave 0 only, then "die"

        eng2 = CrawlEngine(spark, cfg, d)  # fresh instance, same state dir
        eng2.run()
        log = eng2.crawl_log()
        order = [
            (r["crawl_seq"], r["url"])
            for r in log.orderBy("crawl_seq").select("crawl_seq", "url").collect()
        ]
        assert order == oracle.crawl_order
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_politeness_audit_and_blocked(spark, oracle):
    """G5: inter-fetch gaps respect per-host budgets; robots-blocked URLs are
    exactly the oracle's and never fetched."""
    d = tempfile.mkdtemp(prefix="crawlspark_audit_")
    try:
        eng = CrawlEngine(spark, EngineConfig(n_hotels=N_HOTELS), d)
        eng.run()
        from crawlspark import polite

        wave = eng.store.latest_wave()
        log = eng.store.read_deltas("crawl_log", wave)
        aud = polite.audit(log, eng.budgets)
        assert aud.filter(~F.col("ok")).count() == 0
        retired = eng.store.read_deltas("retired", wave)
        blocked = {r["url"] for r in retired.filter(F.col("state") == "blocked").collect()}
        assert blocked == oracle.blocked
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_take_k_throttled_still_converges(spark, oracle):
    """G3: a per-host per-wave cap changes wave composition but NOT the final
    canonical crawl order, seen set, or documents."""
    order, seen, docs, _ = _run_engine(
        spark, EngineConfig(n_hotels=N_HOTELS, take_k=25)
    )
    _assert_equal(oracle, order, seen, docs)


def test_resume_with_changed_sharding_rejected(spark):
    """The bloom sharding is frozen at bootstrap — resuming with a different
    partition count must fail loudly, never silently corrupt membership."""
    d = tempfile.mkdtemp(prefix="crawlspark_freeze_")
    try:
        cfg = EngineConfig(n_hotels=10, seen_mode="bloom", bloom_partitions=8)
        eng = CrawlEngine(spark, cfg, d)
        eng.bootstrap()
        bad = EngineConfig(n_hotels=10, seen_mode="bloom", bloom_partitions=16)
        with pytest.raises(ValueError, match="bloom_partitions"):
            CrawlEngine(spark, bad, d).bootstrap()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_take_k_unfused_path_identical(spark, oracle):
    """The legacy rank()+take() path must equal the salted two-phase default
    (and both equal the oracle)."""
    order, seen, docs, _ = _run_engine(
        spark, EngineConfig(n_hotels=N_HOTELS, take_k=25, salted_topk=False)
    )
    _assert_equal(oracle, order, seen, docs)
