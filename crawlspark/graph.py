"""Host-graph analytics for crawl prioritization.

PageRank over the host link graph is the classic frontier-priority signal
(crawl high-authority hosts first).  The power iteration here is written to
be DETERMINISTIC and SQL-mirrorable: per-edge contributions are computed as
doubles, then fixed-pointed to BIGINT nano-units before the per-target SUM
(exact integer arithmetic — a float sum would depend on the partial-
aggregate merge order), and each round's rank is rounded to 9dp.  The q71
DuckDB oracle unrolls the same rounds as CTEs, so an ITERATIVE float
algorithm gets a full value-hash check instead of the usual rows-only pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PR_SCALE = 1_000_000_000.0  # nano-rank fixed point for exact edge sums
_DAMPING = 0.85
# literal 0.15, NOT computed 1.0-0.85 (= 0.15000000000000002 in IEEE —
# a different double than the 0.15 the SQL mirror parses)
_BASE = 0.15


def pagerank(
    edges: DataFrame,
    n_rounds: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """``n_rounds`` of damped power iteration over a (src, dst) edge list.
    Returns (host, rank).  Uniform init 1/N; dangling mass is dropped (the
    standard simplification when ranks only ORDER a frontier); nodes with
    no in-links keep the (1-d)/N base term.

    Scale shape per round: one equi join of the (n_hosts-sized) rank table
    to the edge list + one hash agg on dst — both shuffles are host-keyed
    and skew-safe (host fan-in is bounded by the host count, not by page
    count, because the graph is host-level).  The rank table is
    localCheckpointed between rounds so lineage stays one round deep."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("host"))
        .unionByName(e.select(F.col("dst").alias("host")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    n = nodes.agg(F.count("*").cast("double").alias("n_nodes"))
    ranks = nodes.crossJoin(F.broadcast(n)).select(
        "host",
        F.round(F.lit(1.0) / F.col("n_nodes"), 9).alias("rank"),
        "n_nodes",
    )
    for _ in range(n_rounds):
        contrib_fp = F.floor(
            (F.col("rank") / F.col("outdeg").cast("double")) * F.lit(_PR_SCALE)
            + F.lit(0.5)
        ).cast("long")
        inflow = (
            e.join(outdeg, "src")
            .join(ranks.withColumnRenamed("host", "src"), "src")
            .select(F.col("dst").alias("host"), contrib_fp.alias("c"))
            .groupBy("host")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            ranks.select("host", "n_nodes")
            .join(inflow, "host", "left")
            .select(
                "host",
                F.round(
                    F.lit(_BASE) / F.col("n_nodes")
                    + F.lit(_DAMPING)
                    * (
                        F.coalesce(F.col("s"), F.lit(0)).cast("double")
                        / F.lit(_PR_SCALE)
                    ),
                    9,
                ).alias("rank"),
                "n_nodes",
            )
            .localCheckpoint()
        )
    return ranks.select("host", "rank")


def priority_from_pagerank(
    edges: DataFrame,
    n_rounds: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """The q71 -> engine feedback loop closed as one call: PageRank the host
    link graph and emit it in ``EngineConfig.priority_table`` shape —
    (host, host_priority) with host_priority = -rank, so higher-authority
    hosts sort FIRST under the engine's ascending priority key.  Feed the
    edges from a previous crawl's link extraction (q64/q65 chain); hosts
    outside the ranked graph fall back to default_host_priority in the
    engine's coalesce."""
    return pagerank(edges, n_rounds, src_col, dst_col).select(
        "host", (-F.col("rank")).alias("host_priority")
    )
