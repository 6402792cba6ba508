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


def flatten_for_training(documents: DataFrame) -> DataFrame:
    """Interleaved documents -> one flat training-text string per doc, with
    every non-text span replaced by a ``<|kind|>`` placeholder token (the
    standard interleaved-multimodal serialization for LLM pretraining, cf.
    Flamingo / OBELICS-style corpora).

    Spans are already offset-ordered by `collect_spans`; the per-span lambda
    is a cheap when/concat (no hash/regexp), so the HOF form is fine here
    (CLAUDE.md rule: only REAL per-element work must move to exploded rows).
    Map-only over assembled docs — no shuffle at any scale.
    """
    spans = F.col("spans")
    return documents.select(
        "doc_id",
        F.size(spans).cast("long").alias("n_spans"),
        F.size(F.filter(spans, lambda s: s["kind"] != "text")).cast("long").alias(
            "n_media"
        ),
        F.array_join(
            F.transform(
                spans,
                lambda s: F.when(s["kind"] == "text", s["text"]).otherwise(
                    F.concat(F.lit("<|"), s["kind"], F.lit("|>"))
                ),
            ),
            " ",
        ).alias("flat_text"),
    ).withColumn("flat_len", F.length("flat_text").cast("long"))
