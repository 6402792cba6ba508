"""Native-expression fixtures must agree bit-for-bit with crawlspark.pagegen."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlspark import fixtures, pagegen as pg
from crawlspark.fetch import spans_for_doc_col

N = 120


def test_seed_dimension_parity(spark):
    rows = fixtures.seed_hotels_df(spark, N).collect()
    assert len(rows) == N
    for r in rows:
        rank = r["listing_rank"]
        assert r["hotel_id"] == pg.hotel_id(rank)
        assert r["host"] == pg.hotel_host(rank)
        assert r["review_count"] == pg.review_count(r["hotel_id"])
        assert r["n_review_pages"] == pg.n_review_pages(r["hotel_id"])
        assert r["private"] == pg.is_private(r["hotel_id"])
        assert r["doc_id"] == pg.doc_id_for(rank)
    # host_local_pos matches pagegen.host_hotels ordering
    by_host = {}
    for r in sorted(rows, key=lambda r: r["listing_rank"]):
        by_host.setdefault(r["host"], []).append(r)
    for host, hs in by_host.items():
        expect = pg.host_hotels(N, host)
        assert [r["listing_rank"] for r in sorted(hs, key=lambda r: r["host_local_pos"])] == expect


def test_initial_frontier_parity(spark):
    rows = fixtures.initial_frontier_df(spark, N).collect()
    expect = {
        pg.listing_url(h, oa) for h in pg.HOSTS for oa in pg.listing_offsets(N, h)
    }
    assert {r["url"] for r in rows} == expect
    for r in rows:
        assert r["url_h"] == pg.url_hash(r["url"])
        assert r["state"] == "pending" and r["depth"] == 0


def test_native_spans_equal_pagegen(spark):
    df = spark.createDataFrame(
        [(pg.doc_id_for(i),) for i in range(50)], "doc_id string"
    ).select("doc_id", spans_for_doc_col(F.col("doc_id")).alias("spans"))
    for r in df.collect():
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        assert got == pg.doc_spans(r["doc_id"]), r["doc_id"]
    # int32 offset mandated (BASELINE.json:15)
    assert dict(df.schema["spans"].dataType.elementType.fields.__iter__().__next__().__dict__) is not None
    offset_field = [f for f in df.schema["spans"].dataType.elementType.fields if f.name == "offset"][0]
    assert offset_field.dataType.simpleString() == "int"


def test_url_builders_parity(spark):
    seeds = fixtures.seed_hotels_df(spark, N)
    df = seeds.select(
        "hotel_id",
        "host",
        fixtures.overview_url_col(F.col("host"), F.col("hotel_id")).alias("ou"),
        fixtures.review_url_col(F.col("host"), F.col("hotel_id"), F.lit(10)).alias("ru"),
    )
    for r in df.collect():
        assert r["ou"] == pg.overview_url(r["host"], r["hotel_id"])
        assert r["ru"] == pg.review_url(r["host"], r["hotel_id"], 10)
