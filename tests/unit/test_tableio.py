"""TableIO backend tests (A1/A4/A5, §7.4): parquet backend round-trips; the
iceberg backend fails loudly in this jar-less sandbox instead of silently
writing a different format."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlspark import io as cio
from crawlspark import fixtures


def test_parquet_roundtrip_and_append(spark, tmp_path):
    t = cio.TableIO(spark, str(tmp_path))
    df = spark.range(10).select(F.col("id").alias("doc_id"))
    t.overwrite(df, "tbl")
    t.append(df, "tbl")
    assert t.read("tbl").count() == 20


def test_iceberg_backend_gated(spark, tmp_path):
    assert not cio.iceberg_available(spark)  # sandbox fact (SURVEY.md §0)
    with pytest.raises(RuntimeError, match="iceberg"):
        cio.TableIO(spark, str(tmp_path), backend="iceberg")


def test_read_seeds_assigns_rank(spark, tmp_path):
    p = str(tmp_path / "seeds.parquet")
    spark.createDataFrame(
        [("h3",), ("h1",), ("h2",)], "hotel_id string"
    ).write.parquet(p)
    got = cio.read_seeds(spark, p).orderBy("listing_rank").toPandas()
    assert list(got.hotel_id) == ["h1", "h2", "h3"]
    assert list(got.listing_rank) == [0, 1, 2]


def test_write_documents_enforces_span_shape(spark, tmp_path):
    t = cio.TableIO(spark, str(tmp_path))
    docs = fixtures.documents_interleaved_df(spark, 5)
    cio.write_documents(t, docs)
    back = t.read("documents")
    assert back.count() == 5
    f = back.schema["spans"].dataType.elementType.fieldNames()
    assert f == ["kind", "text", "media_ref", "offset"]


def test_compact_deltas_preserves_rows_and_reduces_files(spark, tmp_path):
    import os

    from crawlspark.state import StateStore

    store = StateStore(spark, str(tmp_path / "state"))
    for wave in range(5):
        df = spark.range(wave * 100, wave * 100 + 100).select(
            F.col("id").alias("url_h")
        ).repartition(8)
        store.write_delta(df, "crawl_log", wave)
        store.commit(wave, {"config": {}})

    before = sorted(
        r["url_h"] for r in store.read_deltas("crawl_log", 4).collect()
    )
    base = str(tmp_path / "state" / "crawl_log")
    n_before = sum(
        1 for _, _, fs in os.walk(base) for f in fs if f.endswith(".parquet")
    )
    n_after = store.compact_deltas("crawl_log")
    assert n_after < n_before and n_after == 5  # one file per wave
    after = sorted(
        r["url_h"] for r in store.read_deltas("crawl_log", 4).collect()
    )
    assert after == before
    # wave pruning still works post-compaction
    assert store.read_deltas("crawl_log", 2).count() == 300


def test_compaction_crash_window_is_recovered(spark, tmp_path):
    """A kill between compaction's two renames leaves the data only under
    '<table>.old'; re-opening the store must restore it instead of silently
    reporting an empty delta history."""
    import os
    import shutil

    from crawlspark.state import StateStore

    root = str(tmp_path / "state")
    store = StateStore(spark, root)
    for wave in range(3):
        store.write_delta(
            spark.range(wave * 10, wave * 10 + 10).select(F.col("id").alias("url_h")),
            "crawl_log",
            wave,
        )
        store.commit(wave, {"config": {}})
    before = store.read_deltas("crawl_log", 2).count()

    # simulate the crash window: base renamed away, tmp dir half-written
    os.rename(os.path.join(root, "crawl_log"), os.path.join(root, "crawl_log.old"))
    os.makedirs(os.path.join(root, "crawl_log.compacting"))

    healed = StateStore(spark, root)
    assert healed.read_deltas("crawl_log", 2).count() == before
    assert not os.path.exists(os.path.join(root, "crawl_log.compacting"))
    # and a completed-swap leftover (.old beside a live base) is dropped
    shutil.copytree(
        os.path.join(root, "crawl_log"), os.path.join(root, "crawl_log.old")
    )
    StateStore(spark, root)
    assert not os.path.exists(os.path.join(root, "crawl_log.old"))


def test_latest_snapshot_wave_memoized_and_invalidated_on_write(spark, tmp_path):
    """The per-(table, wave) memo (r4 VERDICT 'What's wrong #3'): repeated
    queries at the same wave answer from cache (a snapshot smuggled in
    BEHIND the store's API is invisible), and write_snapshot through the
    API drops the entry so the next read sees fresh state.  A NEW store
    over the same root always reads persistent state first — the
    resume-heavy cadence fix is preserved."""
    import os

    from crawlspark.state import StateStore

    root = str(tmp_path / "state")
    store = StateStore(spark, root)
    df = spark.range(5).select(F.col("id").alias("url_h"))
    store.write_snapshot(df, "frontier", 0)
    assert store.latest_snapshot_wave("frontier", 9) == 0

    # out-of-band directory (bypassing the API): the memo must mask it
    src = os.path.join(root, "frontier", "wave=3")
    dst = os.path.join(root, "frontier", "wave=7")
    import shutil

    store.write_snapshot(df, "frontier", 3)  # API write -> cache dropped
    assert store.latest_snapshot_wave("frontier", 9) == 3
    shutil.copytree(src, dst)
    assert store.latest_snapshot_wave("frontier", 9) == 3  # cached answer
    # different upto_wave misses the single-entry cache -> fresh listing
    assert store.latest_snapshot_wave("frontier", 8) == 7
    # API write invalidates
    store.write_snapshot(df, "frontier", 8)
    assert store.latest_snapshot_wave("frontier", 9) == 8
    # a fresh store (new process in real drives) reads persistent state
    assert StateStore(spark, root).latest_snapshot_wave("frontier", 9) == 8
