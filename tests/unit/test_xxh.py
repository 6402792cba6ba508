"""Bit-parity of the pure-Python XXH64 with Spark's native xxhash64 — the
foundation of oracle↔engine hash agreement."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from crawlspark.xxh import xxh64_str

SAMPLES = [
    "",
    "a",
    "abc",
    "0123456",
    "01234567",
    "0123456789abcde",
    "0123456789abcdef",
    "x" * 31,
    "x" * 32,
    "x" * 33,
    "x" * 100,
    "https://h0.tripadvisor.example/Hotels-g1-oa0.html",
    "héllo ünicode ✓ ™",
    "hotel_00042:7:3",
]


def test_spark_parity(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in SAMPLES:
        assert got[s] == xxh64_str(s), s


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=80))
def test_signed_range(s):
    h = xxh64_str(s)
    assert -(1 << 63) <= h < (1 << 63)


def test_pmod_semantics():
    # Python % on the signed hash equals Spark pmod (floor mod, non-negative)
    for s in SAMPLES:
        assert 0 <= xxh64_str(s) % 96 < 96
