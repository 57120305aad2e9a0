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
