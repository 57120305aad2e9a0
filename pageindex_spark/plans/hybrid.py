"""Hybrid sparse+dense retrieval: BM25 fused with embedding cosine by
Reciprocal Rank Fusion.

The modern search stack runs BOTH retrievers over the same corpus — the
committed BM25 index for lexical match, an embedding column for semantic
match — and fuses the two rankings. RRF (Cormack, Clarke & Büttcher,
SIGIR'09; the default fusion in Elasticsearch 8 / OpenSearch / Vespa) is
the standard because it needs no score calibration: each retriever
contributes ``1 / (k_rrf + rank)`` for the docs in its top-``depth`` list,
and docs sum their contributions. The reference has no retrieval language
at all (an LLM prompt over a tree, /root/reference/README.md:179-188);
this is the same-corpus surface a web-scale user expects next to plain
BM25 and ANN.

Cross-engine exactness: contributions are INTEGERIZED —
``floor(1e6 / (k_rrf + rank))`` per list, summed as bigints — so the
DuckDB twin hashes identically (a float RRF sum would hinge on addition
order across engines). Ranks are small integers and ``1e6 / n`` is one
IEEE double division both engines round identically, so the integerization
loses nothing but immaterial low bits (documented deviation from the
textbook float formula; the ORDER it induces agrees with float RRF
whenever contributions differ by >= 1e-6 — always, at sane depths).

Plan shape (all metadata-sized after the retrievers):

1. **Sparse list** — ordinary ``search(..., k=depth, fixed_point=True)``:
   the committed-index BMW plan, ranks over floored scores (the engine's
   oracle-exact rank order). Tombstones / '-term' negations mask as
   always.
2. **Dense list** — ``cosine_topk_batch(exclude_self=False)``: broadcast
   query vectors, one JVM-codegen pass over the embeddings relation, no
   corpus shuffle.
3. **Fuse** — ONE full-outer join of two <= queries x depth row lists on
   (query_id, url), integer RRF sum, per-query window rank, top-k. Docs
   in only one list keep that list's contribution (the standard RRF
   missing-doc rule).

At 100 TB the retriever stages dominate exactly as they do standalone
(each is already the scale-shaped plan); fusion never touches more than
queries x 2 x depth rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def hybrid_search_rrf(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str]],
    query_vecs: DataFrame,
    embeddings: DataFrame,
    k: int = 10,
    depth: int = 30,
    k_rrf: int = 60,
    mode: str = "bmw",
    cell_parts: int = 4,
) -> DataFrame:
    """Fused top-k -> (query_id, rank, url, rrf6): BM25 over the committed
    index and cosine over ``embeddings`` (url, embedding), each cut at
    ``depth``, fused by integerized Reciprocal Rank Fusion (module
    docstring). ``query_vecs`` is a (query_id, embedding) DataFrame — one
    vector per text query id; a query id missing a vector (or any text
    hits) simply gets no contribution from that list. Ties break url-asc
    (docID order, the engine-wide tie-break)."""
    from ..operators.similarity import cosine_topk_batch
    from .query import get_searcher

    if depth < k:
        raise ValueError(f"depth ({depth}) must be >= k ({k})")
    se = get_searcher(spark, index_dir, cell_parts)
    sparse = se.search(queries, k=depth, mode=mode, fixed_point=True).select(
        "query_id", "url", F.col("rank").alias("sr")
    )
    dense = cosine_topk_batch(
        embeddings,
        query_vecs,
        k=depth,
        key="url",
        vec_col="embedding",
        exclude_self=False,
    ).select("query_id", F.col("vec_id").alias("url"), F.col("rank").alias("dr"))
    contrib = lambda r: F.coalesce(  # noqa: E731 - local expression helper
        F.floor(F.lit(1_000_000.0) / (F.lit(k_rrf) + F.col(r))).cast("long"),
        F.lit(0).cast("long"),
    )
    fused = (
        sparse.join(dense, ["query_id", "url"], "full_outer")
        .withColumn("rrf6", contrib("sr") + contrib("dr"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf6"), F.asc("url"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "url", "rrf6")
    )


def hybrid_search_linear(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str]],
    query_vecs: DataFrame,
    embeddings: DataFrame,
    k: int = 10,
    depth: int = 30,
    weight_pct: int = 70,
    mode: str = "bmw",
    cell_parts: int = 4,
) -> DataFrame:
    """Normalized weighted-sum fusion (the OpenSearch hybrid-search
    ``normalization-processor`` with ``min_max`` normalization +
    ``arithmetic_mean`` combination — the OTHER standard fusion next to
    RRF) -> (query_id, rank, url, lin6): each retriever's top-``depth``
    list min-max normalizes per query, then docs combine as
    ``weight_pct%`` sparse + ``(100-weight_pct)%`` dense.

    Where RRF needs no calibration but flattens score GAPS to rank steps,
    min-max fusion preserves them — a runaway BM25 winner stays a runaway
    — at the cost of sensitivity to each list's min/max; that trade is why
    engines ship both. EVERYTHING after the two floored retriever scores
    is INT64: ``norm6 = ((v - mn) * 1e6) div (mx - mn)`` (a single-value
    list pins to 1e6, the OpenSearch min==max convention),
    ``lin6 = (weight_pct * sn6 + (100-weight_pct) * dn6) div 100`` — no
    float division or sum anywhere an engine could round differently, the
    exact-oracle discipline of ``match_percentiles``. Docs in one list
    only contribute 0 from the other (the missing-doc rule RRF uses too).

    Plan shape: identical to ``hybrid_search_rrf`` — the retrievers
    dominate at scale; normalization adds one tiny per-query min/max agg
    broadcast back over <= queries x depth rows, fusion one full-outer
    join of the two lists, rank one window."""
    from ..operators.similarity import cosine_topk_batch
    from .query import get_searcher

    if depth < k:
        raise ValueError(f"depth ({depth}) must be >= k ({k})")
    if not 0 <= int(weight_pct) <= 100:
        raise ValueError(f"weight_pct must be in [0, 100], got {weight_pct}")
    se = get_searcher(spark, index_dir, cell_parts)

    def _norm(lst: DataFrame, col: str) -> DataFrame:
        # min/max as whole-partition windows, NOT a groupBy + self-join: a
        # branched DAG re-executes the list's subtree for the stats side —
        # for the dense list that is the whole cosine corpus scan (the
        # sparse list is already a driver-materialized local relation, so
        # only cheap rescans there). One lineage either way, and the
        # window runs over <= queries x depth rows.
        wq = Window.partitionBy("query_id")
        return (
            lst.withColumn("mn", F.min(col).over(wq))
            .withColumn("mx", F.max(col).over(wq))
            .withColumn(
                "norm6",
                F.when(F.col("mx") == F.col("mn"), F.lit(1_000_000).cast("long"))
                .otherwise(
                    F.expr(f"(({col} - mn) * 1000000) div (mx - mn)")
                ),
            )
            .select("query_id", "url", "norm6")
        )

    sparse = _norm(
        se.search(queries, k=depth, mode=mode, fixed_point=True).select(
            "query_id",
            "url",
            F.floor(F.col("score") * 1_000_000).cast("long").alias("s6"),
        ),
        "s6",
    ).withColumnRenamed("norm6", "sn6")
    dense = _norm(
        cosine_topk_batch(
            embeddings,
            query_vecs,
            k=depth,
            key="url",
            vec_col="embedding",
            exclude_self=False,
        ).select("query_id", F.col("vec_id").alias("url"), "cos6"),
        "cos6",
    ).withColumnRenamed("norm6", "dn6")
    p = int(weight_pct)
    fused = (
        sparse.join(dense, ["query_id", "url"], "full_outer")
        .withColumn(
            "lin6",
            F.expr(
                f"({p} * coalesce(sn6, 0L) + {100 - p} * coalesce(dn6, 0L)) "
                "div 100"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("lin6"), F.asc("url"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "url", "lin6")
    )
