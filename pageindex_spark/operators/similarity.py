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
LSH_PLANES = 4  # bits per table -> 16 buckets/table
LSH_TABLES = 4  # independent tables; candidates = union over tables


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk_batch(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    key: str = "vec_id",
    vec_col: str = "embedding",
    qkey: str = "query_id",
    qvec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact brute-force cosine top-k for an ARBITRARY queries DataFrame
    (``qkey``, ``qvec_col``) against the corpus — the batched surface
    (VERDICT r4 next #7: the BM25 engine takes a query batch; ANN now does
    too). Output (query_id, rank, vec_id, cos6); a corpus row whose key
    equals the query id is excluded (self-match) unless
    ``exclude_self=False`` (external query vectors — e.g. the hybrid-RRF
    surface — where query ids share no key space with the corpus).

    Plan: broadcast the small query side into a JVM-codegen'd join — one
    pass over the corpus per query batch, no shuffle of the corpus."""
    q = queries.select(F.col(qkey).alias("query_id"), F.col(qvec_col).alias("qv"))
    c = corpus.select(F.col(key).alias("vec_id"), F.col(vec_col).alias("cv"))
    dot = _dot(F.col("qv"), F.col("cv"))
    na = F.sqrt(_dot(F.col("qv"), F.col("qv")))
    nb = F.sqrt(_dot(F.col("cv"), F.col("cv")))
    self_cond = (
        F.col("query_id") != F.col("vec_id") if exclude_self else F.lit(True)
    )
    scored = (
        c.join(F.broadcast(q), self_cond)
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


def cosine_topk(
    vectors: DataFrame,
    n_query_vecs: int = 5,
    k: int = 10,
    key: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: the first ``n_query_vecs`` vectors
    query the rest (driver-contract convenience over ``cosine_topk_batch``).
    """
    queries = vectors.filter(F.col(key) < n_query_vecs).select(
        F.col(key).alias("query_id"), F.col(vec_col).alias("qv")
    )
    return cosine_topk_batch(
        vectors, queries, k, key=key, vec_col=vec_col, qvec_col="qv"
    )


EMB_DIM = 64  # driver testdata embedding width (all scale factors)


def lsh_planes(
    dim: int, n_planes: int = LSH_PLANES, n_tables: int = LSH_TABLES, seed: int = LSH_SEED
) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_planes, dim)).astype(np.float64)


def plane_rows(dim: int = EMB_DIM) -> list[tuple[int, int, list[float]]]:
    """(table, bit_weight, plane) rows for the SQL twin of the LSH bucketing
    — the exact float64 values ``with_lsh_buckets`` uses, bit j weighted
    ``1 << j``, so bucket codes match the DataFrame operator bit-for-bit."""
    planes = lsh_planes(dim)
    return [
        (t, 1 << j, [float(x) for x in planes[t, j]])
        for t in range(LSH_TABLES)
        for j in range(LSH_PLANES)
    ]


def with_lsh_buckets(
    vectors: DataFrame,
    dim: int,
    n_planes: int = LSH_PLANES,
    n_tables: int = LSH_TABLES,
    vec_col: str = "embedding",
) -> DataFrame:
    """Explode each vector into ``n_tables`` rows of (table, bucket): the
    bucket is the sign-bit code of dot(v, plane_j) per table. Deterministic
    (seeded hyperplanes as literals); one narrow projection, no shuffle.
    Multi-table is the standard recall lever: near neighbors must collide
    in AT LEAST ONE table, so recall ~ 1 - (1 - p^b)^L."""
    planes = lsh_planes(dim, n_planes, n_tables)
    tables = []
    for t in range(n_tables):
        bucket = F.lit(0)
        for j in range(n_planes):
            lit = F.array(*[F.lit(float(x)) for x in planes[t, j]])
            bit = F.when(_dot(F.col(vec_col), lit) >= 0, 1).otherwise(0)
            bucket = bucket + bit * F.lit(1 << j)
        tables.append(
            F.struct(F.lit(t).alias("table"), bucket.cast("int").alias("bucket"))
        )
    return (
        vectors.withColumn("tb", F.explode(F.array(*tables)))
        .withColumn("table", F.col("tb.table"))
        .withColumn("bucket", F.col("tb.bucket"))
        .drop("tb")
    )


def lsh_ann_topk_batch(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    key: str = "vec_id",
    vec_col: str = "embedding",
    qkey: str = "query_id",
    qvec_col: str = "embedding",
    n_planes: int = LSH_PLANES,
    n_tables: int = LSH_TABLES,
) -> DataFrame:
    """Approximate top-k for an ARBITRARY queries DataFrame: both sides get
    the same seeded LSH bucketing, so external query vectors (not drawn from
    the corpus) land in the right buckets. Candidates = union over tables of
    the query's bucket co-occupants; dedup, score, rank. One shuffle on
    (table, bucket) via the broadcast join + a distinct."""
    b = with_lsh_buckets(corpus, dim, n_planes, n_tables, vec_col)
    q = with_lsh_buckets(
        queries.select(
            F.col(qkey).alias("query_id"), F.col(qvec_col).alias("qv")
        ),
        dim,
        n_planes,
        n_tables,
        "qv",
    ).select(
        "query_id",
        "qv",
        F.col("table").alias("qt"),
        F.col("bucket").alias("qb"),
    )
    c = b.select(F.col(key).alias("vec_id"), F.col(vec_col).alias("cv"), "table", "bucket")
    cand = (
        c.join(
            F.broadcast(q),
            (F.col("qt") == F.col("table"))
            & (F.col("qb") == F.col("bucket"))
            & (F.col("query_id") != F.col("vec_id")),
        )
        .select("query_id", "qv", "vec_id", "cv")
        .distinct()
    )
    dot = _dot(F.col("qv"), F.col("cv"))
    na = F.sqrt(_dot(F.col("qv"), F.col("qv")))
    nb = F.sqrt(_dot(F.col("cv"), F.col("cv")))
    scored = cand.select(
        "query_id",
        "vec_id",
        F.floor(dot / (na * nb) * 1_000_000).cast("long").alias("cos6"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos6"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos6")
    )


IVF_CENTROID_STRIDE = 37  # deterministic coarse quantizer: vec_id % stride == 0
IVF_N_PROBE = 4


def ivf_centroids(
    corpus: DataFrame,
    stride: int = IVF_CENTROID_STRIDE,
    key: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic coarse quantizer: corpus vectors with ``key % stride
    == 0``, collected driver-side (sorted by id). IVF quantizers are
    driver/broadcast-state by construction — n_centroids ~ n/stride stays
    thousands even at 10^9 vectors with a scale-proportional stride. A
    k-means refinement is deliberately NOT applied: float averages
    accumulate in engine-dependent order, which would break the exact
    SQL-twin parity the driver verifies; the deterministic-sample
    quantizer has the same plan shape and is exactly reproducible in SQL.
    """
    rows = (
        corpus.filter((F.col(key) % stride) == 0)
        .select(key, vec_col)
        .collect()
    )
    return sorted((int(r[key]), [float(x) for x in r[vec_col]]) for r in rows)


def _ivf_cell_scores(vec_col, cents: list[tuple[int, list[float]]]):
    """Array of (cos6 to centroid, -centroid_id) structs as ONE narrow
    projection over centroid literals — assignment and probing never
    shuffle (same literal-plane trick as ``with_lsh_buckets``)."""
    entries = []
    for cid, cvec in cents:
        lit = F.array(*[F.lit(float(x)) for x in cvec])
        dot = _dot(vec_col, lit)
        nv = F.sqrt(_dot(vec_col, vec_col))
        nc = F.sqrt(_dot(lit, lit))
        cos6 = F.floor(dot / (nv * nc) * 1_000_000).cast("long")
        entries.append(
            F.struct(cos6.alias("s"), F.lit(-cid).cast("long").alias("ni"))
        )
    return F.array(*entries)


def ivf_assign(
    corpus: DataFrame,
    cents: list[tuple[int, list[float]]],
    key: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Add a ``cell`` column: the centroid id with the max cos6 (ties ->
    smaller centroid id; ``array_max`` over (s, -cid) structs compares
    lexicographically, so max s then max -cid = min cid). Narrow
    projection, zero shuffle — at scale the assigned corpus is written
    ``partitionBy("cell")`` once so query-time cell joins prune files."""
    best = F.array_max(_ivf_cell_scores(F.col(vec_col), cents))
    return corpus.withColumn("cell", (-best["ni"]).cast("int"))


def ivf_ann_topk_batch(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = IVF_N_PROBE,
    stride: int = IVF_CENTROID_STRIDE,
    key: str = "vec_id",
    vec_col: str = "embedding",
    qkey: str = "query_id",
    qvec_col: str = "embedding",
    cents: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF-style approximate top-k (the second scale path next to LSH):
    corpus vectors are inverted into coarse-quantizer cells; each query
    probes its ``n_probe`` nearest centroids and scores ONLY those cells'
    members. Output (query_id, rank, vec_id, cos6), self-matches excluded.

    Plan: assignment and probe-cell selection are narrow projections over
    broadcast centroid literals (no shuffle); candidates come from ONE
    broadcast join of the exploded (query, probe-cell) pairs against the
    cell-assigned corpus — scored rows ~ n_probe/n_cells of the corpus per
    query instead of all of it. With the corpus pre-partitioned by cell
    (see ``ivf_assign``) the join prunes to the probed cells' files."""
    if cents is None:
        cents = ivf_centroids(corpus, stride, key, vec_col)
    assigned = ivf_assign(corpus, cents, key, vec_col).select(
        F.col(key).alias("vec_id"), F.col(vec_col).alias("cv"), "cell"
    )
    q = queries.select(F.col(qkey).alias("query_id"), F.col(qvec_col).alias("qv"))
    # probe cells: first n_probe of the (s desc, cid asc) ordering ==
    # ascending sort of (-s, -ni) == descending lexicographic of (s, ni).
    scores = _ivf_cell_scores(F.col("qv"), cents)
    probe = F.slice(F.reverse(F.array_sort(scores)), 1, n_probe)
    qcells = (
        q.withColumn("pc", F.explode(probe))
        .select("query_id", "qv", (-F.col("pc")["ni"]).cast("int").alias("cell"))
    )
    dot = _dot(F.col("qv"), F.col("cv"))
    na = F.sqrt(_dot(F.col("qv"), F.col("qv")))
    nb = F.sqrt(_dot(F.col("cv"), F.col("cv")))
    scored = (
        assigned.join(
            F.broadcast(qcells),
            (qcells["cell"] == assigned["cell"])
            & (F.col("query_id") != F.col("vec_id")),
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


def ivf_ann_topk(
    vectors: DataFrame,
    n_query_vecs: int = 5,
    k: int = 10,
    n_probe: int = IVF_N_PROBE,
    stride: int = IVF_CENTROID_STRIDE,
    key: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: the first ``n_query_vecs`` vectors query the
    rest (driver-contract convenience over ``ivf_ann_topk_batch``)."""
    queries = vectors.filter(F.col(key) < n_query_vecs).select(
        F.col(key).alias("query_id"), F.col(vec_col)
    )
    return ivf_ann_topk_batch(
        vectors,
        queries,
        k,
        n_probe=n_probe,
        stride=stride,
        key=key,
        vec_col=vec_col,
        qvec_col=vec_col,
    )


NEARDUP_COS6 = 400_000  # cos >= 0.40: near-dup bar for the driver corpus


def cosine_neardup_pairs(
    corpus: DataFrame,
    dim: int,
    threshold6: int = NEARDUP_COS6,
    key: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = LSH_PLANES,
    n_tables: int = LSH_TABLES,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the dedup-by-embedding
    entry): (vid_a < vid_b, cos6) for every pair that collides in at least
    one LSH table AND scores ``cos6 >= threshold6``. The LSH pre-filter is
    what makes this a dedup operator rather than an O(n^2) scan — the
    self-join shuffles once on the (table, bucket) key and only bucket
    co-occupants are ever scored (recall follows the documented LSH
    S-curve; raise ``n_tables`` to tighten it)."""
    b = with_lsh_buckets(corpus, dim, n_planes, n_tables, vec_col)
    a = b.select(
        F.col(key).alias("vid_a"), F.col(vec_col).alias("va"), "table", "bucket"
    )
    c = b.select(
        F.col(key).alias("vid_b"), F.col(vec_col).alias("vb"), "table", "bucket"
    )
    pairs = (
        a.join(c, ["table", "bucket"])
        .filter(F.col("vid_a") < F.col("vid_b"))
        .select("vid_a", "va", "vid_b", "vb")
        .distinct()
    )
    dot = _dot(F.col("va"), F.col("vb"))
    na = F.sqrt(_dot(F.col("va"), F.col("va")))
    nb = F.sqrt(_dot(F.col("vb"), F.col("vb")))
    return (
        pairs.select(
            "vid_a",
            "vid_b",
            F.floor(dot / (na * nb) * 1_000_000).cast("long").alias("cos6"),
        )
        .filter(F.col("cos6") >= threshold6)
    )


def lsh_ann_topk(
    vectors: DataFrame,
    dim: int,
    n_query_vecs: int = 5,
    k: int = 10,
    key: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = LSH_PLANES,
    n_tables: int = LSH_TABLES,
) -> DataFrame:
    """Approximate top-k: the first ``n_query_vecs`` vectors query the rest
    (driver-contract convenience over ``lsh_ann_topk_batch``). Recall vs the
    exact scan is measured in tests, not asserted exact."""
    queries = vectors.filter(F.col(key) < n_query_vecs).select(
        F.col(key).alias("query_id"), F.col(vec_col)
    )
    return lsh_ann_topk_batch(
        vectors,
        queries,
        dim,
        k,
        key=key,
        vec_col=vec_col,
        qvec_col=vec_col,
        n_planes=n_planes,
        n_tables=n_tables,
    )
