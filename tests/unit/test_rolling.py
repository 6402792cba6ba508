"""Arrow rolling-hash twins (crawlspark.rolling) vs the codegen char-gram
operators (crawlspark.textproc) — bit-equality on the shared xxh variant,
plus the vectorized-XXH64 / reference-XXH64 parity property."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from crawlspark import rolling, textproc
from crawlspark.xxh import to_signed64, xxh64

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


@given(st.binary(min_size=1, max_size=80), st.integers(min_value=1, max_value=31))
@settings(max_examples=200, deadline=None)
def test_xxh64_fixed_grams_matches_reference(data, k):
    if len(data) < k:
        k = len(data)
    buf = np.frombuffer(data, dtype=np.uint8)
    vec = rolling.xxh64_fixed_grams(buf, k)
    ref = [xxh64(data[i : i + k]) for i in range(len(data) - k + 1)]
    assert vec.tolist() == ref


def _edge_docs(spark):
    rows = [
        (1, ""),  # empty
        (2, "a"),  # shorter than any gram
        (3, "abcdefg"),  # == k-1 for k=8
        (4, "abcdefgh"),  # exactly one gram
        (5, "the quick brown fox jumps over the lazy dog " * 6),
        (6, "münchen straße ünïcode " * 8),  # non-ASCII fallback path
        (7, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),  # degenerate repeats
        (8, "mixed ascii then ünicode tail " * 4 + "ß"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_fingerprints_arrow_equals_codegen_xxh(spark, docs):
    """The map-only Arrow twin must reproduce textproc.fingerprints'
    xxh variant bit-for-bit on the real corpus."""
    a = {
        (r["doc_id"], r["fp"])
        for r in rolling.fingerprints_arrow(docs).collect()
    }
    b = {
        (r["doc_id"], r["fp"])
        for r in textproc.fingerprints(docs, hash_fn="xxh").collect()
    }
    assert a == b and len(a) > 0


def test_fingerprints_arrow_equals_codegen_xxh_edges(spark):
    edge = _edge_docs(spark)
    a = {
        (r["doc_id"], r["fp"])
        for r in rolling.fingerprints_arrow(edge).collect()
    }
    b = {
        (r["doc_id"], r["fp"])
        for r in textproc.fingerprints(edge, hash_fn="xxh").collect()
    }
    assert a == b


def test_cdc_arrow_equals_codegen_xxh(spark, docs):
    a = {
        tuple(r)
        for r in rolling.cdc_chunks_arrow(docs)
        .select("doc_id", "chunk_idx", "chunk_start", "chunk_len", "chunk_hash")
        .collect()
    }
    b = {
        tuple(r)
        for r in textproc.cdc_chunks(docs, hash_fn="xxh")
        .select("doc_id", "chunk_idx", "chunk_start", "chunk_len", "chunk_hash")
        .collect()
    }
    assert a == b and len(a) > 0


def test_cdc_arrow_equals_codegen_xxh_edges(spark):
    edge = _edge_docs(spark)
    a = {
        tuple(r)
        for r in rolling.cdc_chunks_arrow(edge)
        .select("doc_id", "chunk_idx", "chunk_start", "chunk_len", "chunk_hash")
        .collect()
    }
    b = {
        tuple(r)
        for r in textproc.cdc_chunks(edge, hash_fn="xxh")
        .select("doc_id", "chunk_idx", "chunk_start", "chunk_len", "chunk_hash")
        .collect()
    }
    assert a == b


def test_fingerprints_arrow_plan_has_no_shuffle(spark, docs):
    """The whole point of the twin: one mapInPandas stage, zero exchanges
    (the codegen form shuffles len(text) rows/doc through a window)."""
    plan = rolling.fingerprints_arrow(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_variant_arrow_dispatch(spark, docs):
    """Pipeline callers flip variant="arrow" on the textproc operators
    (never importing rolling directly) and get the map-only twin: identical
    rows, zero exchanges, and a loud error if combined with the md5 oracle
    form."""
    import pytest

    a = {
        (r["doc_id"], r["fp"])
        for r in textproc.fingerprints(docs, hash_fn="xxh", variant="arrow").collect()
    }
    b = {
        (r["doc_id"], r["fp"])
        for r in textproc.fingerprints(docs, hash_fn="xxh").collect()
    }
    assert a == b and len(a) > 0
    plan = (
        textproc.fingerprints(docs, hash_fn="xxh", variant="arrow")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    c = {
        tuple(r)
        for r in textproc.cdc_chunks(docs, hash_fn="xxh", variant="arrow").collect()
    }
    d = {tuple(r) for r in textproc.cdc_chunks(docs, hash_fn="xxh").collect()}
    assert c == d and len(c) > 0
    with pytest.raises(ValueError, match="xxh"):
        textproc.fingerprints(docs, variant="arrow")
    with pytest.raises(ValueError, match="xxh"):
        textproc.cdc_chunks(docs, variant="arrow")


def test_q73_arrow_pipeline_equals_codegen_composition(spark, docs):
    """The composed q73 pipeline (Arrow CDC twin -> chunk-level dedup) must
    be bit-equal to the same composition over the codegen xxh form — the
    end-to-end evidence behind q73's rows-only driver check."""
    import crawlspark.pipeline_queries as pq

    sf_dir = "/root/testdata/sf0.001"
    got = {tuple(r) for r in pq.q73_chunk_dedup_arrow(spark, sf_dir).collect()}
    ch = textproc.cdc_chunks(docs, hash_fn="xxh")

    expect = {
        tuple(r)
        for r in (
            ch.groupBy("chunk_hash")
            .agg(
                F.count("*").alias("n_occurrences"),
                F.countDistinct("doc_id").alias("n_docs"),
                F.min(F.struct("doc_id", "chunk_start")).alias("k"),
                F.min("chunk_len").alias("chunk_len"),
            )
            .filter(F.col("n_occurrences") > 1)
            .select(
                "chunk_hash",
                "n_occurrences",
                "n_docs",
                F.col("k.doc_id").alias("keeper_doc"),
                F.col("k.chunk_start").cast("long").alias("keeper_start"),
                "chunk_len",
            )
            .collect()
        )
    }
    assert got == expect and len(got) > 0


def test_md5_default_unchanged(spark, docs):
    """hash_fn must default to the DuckDB-mirrorable md5 forms (q38/q61
    oracles depend on them)."""
    fp = textproc.fingerprints(docs.limit(5))
    assert dict(fp.dtypes)["fp"] == "string"
    cdc = textproc.cdc_chunks(docs.limit(5))
    assert "chunk_md5" in cdc.columns
