"""Similarity search over embedding columns: brute-force cosine top-k
(exact baseline) and an LSH-bucketed approximate variant (the scale path).

Embeddings are ``array<float>`` columns. The exact path is pure JVM
expressions (``zip_with`` dot product inside whole-stage codegen) and has a
DuckDB oracle twin. The LSH path buckets by random-hyperplane sign bits so
candidate generation is one shuffle on the bucket key — at 10^12 vectors the
cross join disappears and each bucket scores locally (IVF-style).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

LSH_SEED = 42
LSH_PLANES = 8


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    vectors: DataFrame,
    n_query_vecs: int = 5,
    k: int = 10,
    key: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: the first ``n_query_vecs`` vectors
    query the rest. Output (query_id, rank, vec_id, cos6).

    Plan: broadcast the tiny query side into a JVM-codegen'd cross join —
    one pass over the corpus per batch of queries, no shuffle of the corpus.
    """
    q = vectors.filter(F.col(key) < n_query_vecs).select(
        F.col(key).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = vectors.select(F.col(key).alias("vec_id"), F.col(vec_col).alias("cv"))
    dot = _dot(F.col("qv"), F.col("cv"))
    na = F.sqrt(_dot(F.col("qv"), F.col("qv")))
    nb = F.sqrt(_dot(F.col("cv"), F.col("cv")))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            F.floor(dot / (na * nb) * 1_000_000).cast("long").alias("cos6"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos6"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos6")
    )


def lsh_planes(dim: int, n_planes: int = LSH_PLANES, seed: int = LSH_SEED) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def with_lsh_bucket(
    vectors: DataFrame, dim: int, n_planes: int = LSH_PLANES, vec_col: str = "embedding"
) -> DataFrame:
    """+ ``bucket`` int column: sign bits of dot(v, plane_j). Deterministic
    (seeded hyperplanes as literals). One narrow projection, no shuffle."""
    planes = lsh_planes(dim, n_planes)
    bucket = F.lit(0)
    for j in range(n_planes):
        lit = F.array(*[F.lit(float(x)) for x in planes[j]])
        bit = F.when(_dot(F.col(vec_col), lit) >= 0, 1).otherwise(0)
        bucket = bucket + bit * F.lit(1 << j)
    return vectors.withColumn("bucket", bucket.cast("int"))


def lsh_ann_topk(
    vectors: DataFrame,
    dim: int,
    n_query_vecs: int = 5,
    k: int = 10,
    key: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = LSH_PLANES,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    Output (query_id, rank, vec_id, cos6) — a subset/reorder of the exact
    result by construction (recall measured in tests, not asserted exact).
    """
    b = with_lsh_bucket(vectors, dim, n_planes, vec_col)
    q = b.filter(F.col(key) < n_query_vecs).select(
        F.col(key).alias("query_id"), F.col(vec_col).alias("qv"), F.col("bucket").alias("qb")
    )
    c = b.select(F.col(key).alias("vec_id"), F.col(vec_col).alias("cv"), "bucket")
    dot = _dot(F.col("qv"), F.col("cv"))
    na = F.sqrt(_dot(F.col("qv"), F.col("qv")))
    nb = F.sqrt(_dot(F.col("cv"), F.col("cv")))
    scored = (
        c.join(
            F.broadcast(q),
            (F.col("qb") == F.col("bucket")) & (F.col("query_id") != F.col("vec_id")),
        )
        .select(
            "query_id",
            "vec_id",
            F.floor(dot / (na * nb) * 1_000_000).cast("long").alias("cos6"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos6"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos6")
    )
