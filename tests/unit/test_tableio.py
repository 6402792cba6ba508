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
