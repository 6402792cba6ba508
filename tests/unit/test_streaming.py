"""Streaming skin tests (I2/I3/I5): state must persist across micro-batch
runs — the streaming twin of checkpointed wave resume."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from crawlspark import streaming


def _drop(spark, path, rows):
    df = spark.createDataFrame(rows, streaming.FRONTIER_STREAM_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(path)


def test_streaming_seen_filter_across_batches(spark, tmp_path):
    src = str(tmp_path / "frontier_in")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    ts = dt.datetime(2024, 1, 1)
    rows1 = [(f"https://h.com/{i}", i * 7919, "h.com", ts) for i in range(100)]
    _drop(spark, src, rows1)

    def run_once():
        fr = streaming.read_frontier_stream(spark, src)
        new = streaming.seen_filter_stream(fr, p=4)
        streaming.run_to_sink(new, ckpt, out)

    run_once()
    got1 = spark.read.parquet(out)
    assert got1.count() == 100

    # second drop: 50 duplicates of batch 1 + 50 genuinely new — the bloom
    # state in the checkpoint must filter the duplicates
    rows2 = [(f"https://h.com/{i}", i * 7919, "h.com", ts) for i in range(50)] + [
        (f"https://h.com/n{i}", 10_000_000 + i * 104729, "h.com", ts) for i in range(50)
    ]
    _drop(spark, src, rows2)
    run_once()
    got2 = spark.read.parquet(out)
    assert got2.count() == 150, "duplicates from batch 1 must be filtered by state"
    assert got2.select("url_h").distinct().count() == 150


def test_streaming_windowed_counts_with_watermark(spark, tmp_path):
    src = str(tmp_path / "fetched_in")
    ckpt = str(tmp_path / "ckpt2")
    out = str(tmp_path / "out2")
    base = dt.datetime(2024, 1, 1)
    rows = [
        (f"https://h.com/{i}", i, "h.com", base + dt.timedelta(seconds=20 * i))
        for i in range(12)
    ]
    _drop(spark, src, rows)
    fr = streaming.read_frontier_stream(spark, src)
    agg = streaming.windowed_fetch_counts(fr, window="1 minute")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # append mode emits only windows sealed by the watermark; with 12 fetches
    # spanning 4 minutes and a 5-minute watermark nothing seals in one run —
    # drop a far-future row to advance the watermark past the data
    _drop(spark, src, [("https://h.com/z", 999, "h.com", base + dt.timedelta(hours=1))])
    fr2 = streaming.read_frontier_stream(spark, src)
    agg2 = streaming.windowed_fetch_counts(fr2, window="1 minute")
    q2 = (
        agg2.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    got = spark.read.parquet(out).toPandas()
    assert len(got) >= 4  # the four 1-minute windows of the original data
    assert (got.groupby("start").n_fetched.sum() >= 1).all()


def test_engine_stream_twin_of_batch_exact_mode(spark):
    """I1 streaming skin: one engine wave per micro-batch (foreachBatch over
    a tick stream) must reproduce the frozen oracle's exact crawl order on
    the 100-hotel fixture — the streaming twin of test_exact_mode."""
    import shutil
    import tempfile

    from crawlspark.engine import CrawlEngine, EngineConfig
    from crawlspark import streaming as st
    from oracle_ref import run_oracle

    oracle = run_oracle(100)
    d = tempfile.mkdtemp(prefix="crawlspark_stream_eng_")
    ckpt = tempfile.mkdtemp(prefix="crawlspark_stream_ckpt_")
    try:
        eng = CrawlEngine(spark, EngineConfig(n_hotels=100, seen_mode="exact"), d)
        waves = st.run_engine_stream(eng, ckpt)
        assert waves > 0
        log = eng.crawl_log()
        order = [
            (r["crawl_seq"], r["url"])
            for r in log.orderBy("crawl_seq").select("crawl_seq", "url").collect()
        ]
        assert order == oracle.crawl_order
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_engine_stream_cuckoo_recrawl_between_microbatch_runs(spark):
    """I1 + D3 together: the streaming drive works in cuckoo mode, and a
    recrawl (seen-set DELETE + re-queue) issued between two streaming runs
    is honored by the next run — the re-queued keys are fetched a second
    time, everything else exactly once, and the final canonical order of
    the first drain equals the frozen oracle's."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from crawlspark.engine import CrawlEngine, EngineConfig
    from crawlspark import streaming as st
    from oracle_ref import run_oracle

    n_hotels = 20
    oracle = run_oracle(n_hotels)
    d = tempfile.mkdtemp(prefix="crawlspark_stream_ck_")
    ckpt1 = tempfile.mkdtemp(prefix="crawlspark_stream_ckckpt1_")
    ckpt2 = tempfile.mkdtemp(prefix="crawlspark_stream_ckckpt2_")
    try:
        cfg = EngineConfig(n_hotels=n_hotels, seen_mode="cuckoo")
        eng = CrawlEngine(spark, cfg, d)
        waves = st.run_engine_stream(eng, ckpt1)
        assert waves > 0
        log0 = eng.crawl_log()
        order = [
            (r["crawl_seq"], r["url"])
            for r in log0.orderBy("crawl_seq").select("crawl_seq", "url").collect()
        ]
        assert order == oracle.crawl_order  # cuckoo streaming drain == oracle

        # delete-path between micro-batch runs: recrawl every 4th overview
        wave0 = eng.store.latest_wave()
        raw0 = eng.store.read_deltas("crawl_log", wave0)
        targets = (
            raw0.filter(
                (F.col("kind") == "overview") & (F.pmod(F.col("url_h"), F.lit(4)) == 0)
            )
            .select("url_h")
            .distinct()
        )
        n_targets = targets.count()
        assert n_targets > 0
        assert eng.recrawl(targets) == n_targets

        # a SECOND streaming run (fresh checkpoint dir, same state store)
        # must pick up the re-queued keys and fetch them again
        waves2 = st.run_engine_stream(eng, ckpt2)
        assert waves2 > 0
        wave1 = eng.store.latest_wave()
        raw1 = eng.store.read_deltas("crawl_log", wave1)
        counts = (
            raw1.groupBy("url_h").count().toPandas().set_index("url_h")["count"]
        )
        twice = set(counts[counts == 2].index)
        assert twice == {r["url_h"] for r in targets.collect()}
        assert (counts.drop(list(twice)) == 1).all()
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(ckpt1, ignore_errors=True)
        shutil.rmtree(ckpt2, ignore_errors=True)


def test_engine_stream_adaptive_priority_twin_of_batch(spark):
    """The streaming drive must honor the adaptive scheduling config the
    same way the batch loop does: a priority_table + wave_k stream run
    produces the identical crawl order to the batch run under the same
    config (both are the pure adaptive sort key)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from crawlspark import fixtures, streaming as st
    from crawlspark.engine import CrawlEngine, EngineConfig

    n_hotels = 20
    prio = (
        fixtures.initial_frontier_df(spark, n_hotels)
        .select("host")
        .distinct()
        .withColumn(
            "host_priority",
            (F.pmod(F.xxhash64("host"), F.lit(5)) - F.lit(2)).cast("double"),
        )
        .localCheckpoint()
    )

    def run(drive):
        d = tempfile.mkdtemp(prefix="crawlspark_adstream_")
        ckpt = tempfile.mkdtemp(prefix="crawlspark_adstream_ckpt_")
        try:
            cfg = EngineConfig(n_hotels=n_hotels, priority_table=prio, wave_k=60)
            eng = CrawlEngine(spark, cfg, d)
            if drive == "stream":
                assert st.run_engine_stream(eng, ckpt) > 0
            else:
                eng.run()
            log = eng.crawl_log()
            return [
                r["url"] for r in log.orderBy("crawl_seq").select("url").collect()
            ]
        finally:
            shutil.rmtree(d, ignore_errors=True)
            shutil.rmtree(ckpt, ignore_errors=True)

    assert run("batch") == run("stream")


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Native bounded-state streaming dedup: duplicates arriving within the
    watermark horizon are dropped; each url_h is emitted exactly once across
    micro-batches of the same run."""
    src = str(tmp_path / "dedup_in")
    ckpt = str(tmp_path / "ckpt3")
    out = str(tmp_path / "out3")
    ts = dt.datetime(2024, 1, 1)
    rows = (
        [(f"https://h.com/{i}", i * 7919, "h.com", ts) for i in range(80)]
        # same keys again, same event time (well inside the watermark)
        + [(f"https://h.com/{i}", i * 7919, "h.com", ts) for i in range(40)]
    )
    _drop(spark, src, rows)
    fr = streaming.read_frontier_stream(spark, src)
    ded = streaming.dedup_within_watermark(fr, watermark="10 minutes")
    q = (
        ded.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() == 80
    assert got.select("url_h").distinct().count() == 80
