"""TableIO (SURVEY.md §2 A1-A5, §7.4): one table abstraction, two backends.

- ``iceberg`` — production: `df.writeTo(catalog.ns.table)` append/overwrite,
  snapshot isolation from the Iceberg catalog.  The sandbox ships no Iceberg
  jar, so this backend is config-gated and raises a clear error if the
  runtime lacks it (BASELINE.json:15 names Iceberg as the production store).
- ``parquet`` — local default: identical schemas, snapshot semantics
  emulated with the same atomic-manifest discipline as state.StateStore.

Keeping frontier/documents/crawl_log as SEPARATE tables is deliberate:
column pruning then has leverage (scheduling never reads `spans`, assembly
never reads scheduling columns).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


class TableIO:
    def __init__(self, spark: SparkSession, root: str, backend: str = "parquet"):
        assert backend in ("parquet", "iceberg")
        if backend == "iceberg" and not iceberg_available(spark):
            raise RuntimeError(
                "iceberg backend requested but no Iceberg jar on the classpath; "
                "use backend='parquet' (identical schemas) or add "
                "org.apache.iceberg:iceberg-spark-runtime to spark.jars.packages"
            )
        if backend == "iceberg" and ("/" in root or "\\" in root):
            raise ValueError(
                f"iceberg backend takes a catalog[.namespace] prefix as root, "
                f"not a filesystem path: {root!r} (e.g. 'crawl_catalog.prod')"
            )
        self.spark = spark
        self.root = root
        self.backend = backend

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _ident(self, name: str) -> str:
        """Iceberg table identifier: root is a catalog[.namespace] prefix
        joined with '.', never a filesystem path."""
        return f"{self.root}.{name}"

    def read(self, name: str) -> DataFrame:
        if self.backend == "iceberg":
            return self.spark.read.table(self._ident(name))
        return self.spark.read.parquet(self._path(name))

    def append(self, df: DataFrame, name: str) -> None:
        if self.backend == "iceberg":
            df.writeTo(self._ident(name)).append()
        else:
            df.write.mode("append").parquet(self._path(name))

    def overwrite(self, df: DataFrame, name: str) -> None:
        if self.backend == "iceberg":
            df.writeTo(self._ident(name)).createOrReplace()
        else:
            df.write.mode("overwrite").parquet(self._path(name))


# -- small dimension readers (A1, A4) ----------------------------------------


def read_seeds(spark: SparkSession, path: str) -> DataFrame:
    """Seed hotel-ID list: (hotel_id, listing_rank) — tiny, broadcastable."""
    df = spark.read.parquet(path) if path.endswith("parquet") else spark.read.json(path)
    assert "hotel_id" in df.columns
    if "listing_rank" not in df.columns:
        from pyspark.sql import Window

        df = df.withColumn(
            "listing_rank",
            (F.row_number().over(Window.orderBy("hotel_id")) - 1).cast("int"),
        )
    return df


def read_robots(spark: SparkSession, path: str) -> DataFrame:
    """robots rules table: (host, disallow_prefix array<string>, crawl_delay_ms)."""
    df = spark.read.json(path) if path.endswith(("json", "jsonl")) else spark.read.parquet(path)
    for c in ("host", "disallow_prefix"):
        assert c in df.columns, f"robots table missing column {c}"
    if "crawl_delay_ms" not in df.columns:
        df = df.withColumn("crawl_delay_ms", F.lit(None).cast("int"))
    return df


def write_documents(io: TableIO, docs: DataFrame, name: str = "documents") -> None:
    """A5 document sink in the mandated interleaved shape (doc_id, spans)."""
    assert docs.schema["spans"].dataType.typeName() == "array"
    io.append(docs.select("doc_id", "spans"), name)


def parse_sitemap(raw: DataFrame) -> DataFrame:
    """Parse fetched sitemap.xml bodies -> frontier seed rows
    (host, url, lastmod timestamp|null).

    Input: (host, body).  Handles the <urlset> grammar crawlers consume in
    practice: every <url> entry's <loc>, with its optional sibling <lastmod>
    (W3C datetime, date-only accepted).  Pure native: regexp_extract_all of
    the <url> blocks, then per-block <loc>/<lastmod> extraction — one
    map-only pass over per-host-bounded bodies, no shuffle.  Feeds the same
    frontier union path as seed lists; pair with an as-of join against the
    crawl log for lastmod-conditional refetch."""
    blocks = raw.select(
        "host",
        F.explode(
            F.regexp_extract_all(F.col("body"), F.lit(r"(?s)<url>(.*?)</url>"), 1)
        ).alias("blk"),
    )
    url = F.trim(F.regexp_extract(F.col("blk"), r"<loc>\s*([^<]+?)\s*</loc>", 1))
    lastmod = F.regexp_extract(F.col("blk"), r"<lastmod>\s*([^<]+?)\s*</lastmod>", 1)
    # full W3C datetime precision (time-of-day matters for same-day refetch
    # decisions), via try_to_timestamp so one malformed value cannot abort
    # the job under ANSI mode; unparseable -> null (treated as unknown)
    ts = F.coalesce(
        F.try_to_timestamp(lastmod, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(lastmod, F.lit("yyyy-MM-dd'T'HH:mm:ss")),
        F.try_to_timestamp(lastmod, F.lit("yyyy-MM-dd")),
    )
    return (
        blocks.select(
            "host",
            url.alias("url"),
            F.when(lastmod == "", None).otherwise(ts).alias("lastmod"),
        )
        .filter(F.col("url") != "")
    )
