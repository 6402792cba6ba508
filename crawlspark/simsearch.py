"""Similarity search over an embedding column (``array<float>``).

- ``topk_bruteforce``: exact cosine top-k of a small query set against the
  corpus — the correctness baseline.  The query side is broadcast (it is
  small by contract), so the corpus is scanned once with no shuffle.
- ``hyperplane_buckets`` + ``topk_lsh``: random-hyperplane LSH (Charikar,
  STOC'02) — sign-bit bucket per vector; candidate set = same bucket under
  any of ``n_tables`` independent sign-bit projections; exact cosine re-rank
  of candidates.  At 100 TB the bucket join replaces the O(n·q) scan.

All vector math is native higher-order functions (zip_with/aggregate) in
double precision — JVM-side, no Python in the loop.  Hyperplane components
are deterministic (numpy PCG seeded, generated driver-side once, embedded as
literals) so results are reproducible across runs and cluster sizes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DIM = 64


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _norm(v: Column) -> Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def topk_bruteforce(
    emb: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query: (q_vec_id, neighbor_id, rk).
    Broadcast the (small) query side; rank = window per query with a
    deterministic vec_id tie-break; self-matches excluded."""
    d = emb.select(
        F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("norm", _norm(F.col("v")))
    q = d.filter(F.col("vid").isin(query_ids) if query_ids else F.col("vid") < 8).select(
        F.col("vid").alias("q_vec_id"), F.col("v").alias("qv"), F.col("norm").alias("qn")
    )
    joined = d.crossJoin(F.broadcast(q)).filter(F.col("vid") != F.col("q_vec_id"))
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("norm"))
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cos"), F.asc("vid"))
    return (
        joined.withColumn("cos", cos)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_vec_id", F.col("vid").alias("neighbor_id"), "rk")
    )


def topk_bruteforce_arrow(
    emb: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow fast path for the exact top-k scan (SURVEY §2 J4): the query
    matrix is collected once (small by contract) and broadcast into a
    mapInPandas stage that computes cosine via one numpy matmul per Arrow
    batch and keeps only each batch's local top-k per query — Spark's
    higher-order array functions are interpreted per element, while this
    path is BLAS-vectorized.  A final window over the <= k·n_batches
    survivors yields the exact global top-k (identical to
    topk_bruteforce; oracle-checked as q44)."""
    q_rows = (
        emb.filter(
            F.col(id_col).isin(query_ids) if query_ids else F.col(id_col) < 8
        )
        .select(id_col, vec_col)
        .collect()
    )
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("q_vec_id", T.LongType()),
            T.StructField("vid", T.LongType()),
            T.StructField("cos", T.DoubleType()),
        ]
    )

    def fn(batches):
        for pdf in batches:
            V = np.array(list(pdf[vec_col]), dtype=np.float64)
            ids = pdf[id_col].to_numpy()
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            C = Vn @ Qn.T  # (batch, n_queries)
            frames = []
            for qi in range(len(q_ids)):
                col = C[:, qi]
                mask = ids != q_ids[qi]
                order = np.argsort(-col[mask], kind="stable")[:k]
                sel = np.where(mask)[0][order]
                frames.append(
                    pd.DataFrame(
                        {"q_vec_id": q_ids[qi], "vid": ids[sel], "cos": col[sel]}
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    cand = emb.select(id_col, vec_col).mapInPandas(fn, out_schema)
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cos"), F.asc("vid"))
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_vec_id", F.col("vid").alias("neighbor_id"), "rk")
    )


def _planes(n_planes: int, dim: int = DIM, seed: int = 42) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def hyperplane_buckets(
    emb: DataFrame,
    n_planes: int = 12,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vid, v, norm, table, bucket): sign-bit bucket id per hash table.
    Bucket = Σ_j (dot(v, plane_j) > 0) << j over that table's planes."""
    d = emb.select(
        F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("norm", _norm(F.col("v")))
    buckets = []
    for t in range(n_tables):
        planes = _planes(n_planes, seed=42 + t)
        bucket = F.lit(0).cast("long")
        for j, p in enumerate(planes):
            pl = F.array(*[F.lit(float(x)) for x in p])
            bit = F.when(_dot(F.col("v"), pl) > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(
                F.lit(0).cast("long")
            )
            bucket = bucket.bitwiseOR(bit)
        buckets.append(bucket)
    # one posexplode pass over all tables' buckets — a per-table union would
    # rescan the corpus n_tables times
    return d.select(
        "vid", "v", "norm", F.posexplode(F.array(*buckets)).alias("table", "bucket")
    )


def topk_lsh(
    emb: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 5,
    n_planes: int = 5,
    n_tables: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share a bucket with the query in any
    table; exact cosine re-rank of candidates.  Recall grows with n_tables;
    the bucket equi join keeps cost ~ corpus/2^n_planes per query."""
    b = hyperplane_buckets(emb, n_planes, n_tables, id_col, vec_col).persist()
    qf = F.col("vid").isin(query_ids) if query_ids else F.col("vid") < 8
    q = b.filter(qf).select(
        F.col("vid").alias("q_vec_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qn"),
        "table",
        "bucket",
    )
    cand = (
        b.join(F.broadcast(q), ["table", "bucket"])
        .filter(F.col("vid") != F.col("q_vec_id"))
        .select("q_vec_id", "qv", "qn", "vid", "v", "norm")
        .dropDuplicates(["q_vec_id", "vid"])
    )
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("norm"))
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cos"), F.asc("vid"))
    return (
        cand.withColumn("cos", cos)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_vec_id", F.col("vid").alias("neighbor_id"), "rk", F.round("cos", 4).alias("cos"))
    )
