"""Document assembly (SURVEY.md §2 E4/F4): flat span rows -> interleaved
documents in the driver-mandated shape (BASELINE.json:15).

Span order is restored by the `offset` sort key inside sort_array — NEVER by
arrival order (Spark guarantees none).  collect_list is safe here because a
document's spans are bounded (a page's worth each), not data-scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPAN_ROW_COLS = ["doc_id", "kind", "text", "media_ref", "offset"]


def explode_spans(documents: DataFrame) -> DataFrame:
    """interleaved documents -> flat span rows."""
    return documents.select(
        "doc_id", F.explode("spans").alias("s")
    ).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )


def collect_spans(span_rows: DataFrame) -> DataFrame:
    """flat span rows -> interleaved documents.  One hash-shuffle on doc_id;
    ordering restored by offset (struct sort key first), then re-projected to
    the mandated field order (kind, text, media_ref, offset:int32)."""
    return (
        span_rows.groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("offset", "kind", "text", "media_ref"))
            ).alias("_s")
        )
        .select(
            "doc_id",
            F.transform(
                F.col("_s"),
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["offset"].cast("int").alias("offset"),
                ),
            ).alias("spans"),
        )
    )
