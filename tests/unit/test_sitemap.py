"""Sitemap source tests: <urlset> parsing and lastmod-conditional refetch
selection against a prior crawl log."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from crawlspark import io as cio

BODY = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://h.com/a</loc><lastmod>2024-03-01</lastmod></url>
  <url><loc> https://h.com/b </loc></url>
  <url><lastmod>2024-01-01</lastmod></url>
  <url><loc>https://h.com/c</loc><lastmod>2024-02-15T10:00:00+00:00</lastmod></url>
</urlset>"""


def test_parse_sitemap_loc_and_lastmod(spark):
    raw = spark.createDataFrame([("h.com", BODY)], "host string, body string")
    rows = {r["url"]: r["lastmod"] for r in cio.parse_sitemap(raw).collect()}
    assert rows == {
        "https://h.com/a": dt.datetime(2024, 3, 1),
        "https://h.com/b": None,  # no lastmod -> null, still a seed
        "https://h.com/c": dt.datetime(2024, 2, 15, 10, 0),  # full time kept
    }  # loc-less <url> block dropped


def test_sitemap_malformed_lastmod_is_null_not_crash(spark):
    body = (
        '<urlset><url><loc>https://h.com/ok</loc>'
        "<lastmod>March 2024</lastmod></url></urlset>"
    )
    raw = spark.createDataFrame([("h.com", body)], "host string, body string")
    rows = cio.parse_sitemap(raw).collect()
    assert rows[0]["url"] == "https://h.com/ok" and rows[0]["lastmod"] is None


def test_sitemap_lastmod_drives_refetch_selection(spark):
    raw = spark.createDataFrame([("h.com", BODY)], "host string, body string")
    seeds = cio.parse_sitemap(raw)
    log = spark.createDataFrame(
        [
            ("https://h.com/a", dt.datetime(2024, 2, 1)),   # stale: lastmod after
            ("https://h.com/c", dt.datetime(2024, 2, 20)),  # fresh: crawled after
        ],
        "url string, last_crawled timestamp",
    )
    due = (
        seeds.join(log, "url", "left")
        .filter(
            F.col("last_crawled").isNull()
            | (F.col("lastmod") > F.col("last_crawled"))
        )
        .select("url")
    )
    assert {r["url"] for r in due.collect()} == {
        "https://h.com/a",   # modified since last crawl
        "https://h.com/b",   # never crawled
    }
