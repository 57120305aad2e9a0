"""BM25 scoring — relational formulation (k1=1.2, b=0.75).

Exact-score reference path: joins + aggregations only, fully
Catalyst-optimizable and DuckDB-expressible. The WAND path (``wand.py``)
must reproduce these scores rank-identically; pytest pins both to the
pure-Python oracle.

Reference parity: this is the engine's replacement for PageIndex's
"reasoning-based retrieval" (LLM node selection, README.md:168-208 and
``/root/reference/pageindex/utils.py:174-219`` tree helpers) per the
north rule — top-k relevance over the corpus, deterministic.

Plan shape (verified via .explain):
* query terms are a tiny relation -> **broadcast** join against postings
  (never shuffle the postings by query);
* ``term_stats`` (df per term) for only the query's terms is tiny ->
  broadcast;
* ``doc_stats`` join is the one real shuffle (postings x doc_len on url) —
  on the SPIMI path this join disappears because doc_len is baked into the
  block-max/tf-quality at build time;
* final per-(query, doc) sum then global top-k via rank-over-window limited
  to k (Spark pushes the window-rank filter; per-query volume is small).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.tokenizer import BM25_B, BM25_K1


def idf_col(n_docs: int):
    return F.log((F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)


def query_terms(queries: DataFrame) -> DataFrame:
    """(query_id, query_text) -> distinct (query_id, term). Duplicate query
    terms are deduplicated (query tf = 1), matching the oracle."""
    from .extract import terms_col

    return queries.select(
        "query_id", F.explode(terms_col("query_text")).alias("term")
    ).distinct()


def score_queries(
    postings: DataFrame,
    docstats: DataFrame,
    termstats: DataFrame,
    queries: DataFrame,
    n_docs: int,
    avgdl: float,
    key: str = "url",
) -> DataFrame:
    """Exhaustive BM25: (query_id, key, score) for every matching doc."""
    qt = query_terms(queries)
    contrib = (
        postings.join(F.broadcast(qt), "term")
        .join(F.broadcast(termstats), "term")
        .join(docstats, key)
        .withColumn("idf", idf_col(n_docs))
        .withColumn(
            "contrib",
            F.col("idf")
            * F.col("tf")
            * (BM25_K1 + 1.0)
            / (
                F.col("tf")
                + BM25_K1
                * (1.0 - BM25_B + BM25_B * F.col("doc_len") / F.lit(float(avgdl)))
            ),
        )
    )
    return contrib.groupBy("query_id", key).agg(F.sum("contrib").alias("score"))


def topk(scored: DataFrame, k: int = 10, key: str = "url") -> DataFrame:
    """Per-query top-k with deterministic tie-break (score desc, key asc)."""
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(key))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", key, "score")
    )


def bm25_topk_relational(
    docs: DataFrame, queries: DataFrame, k: int = 10, key: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """End-to-end naive path: documents + queries -> (query_id, rank, key, score)."""
    from .postings import build_postings, corpus_stats, doc_stats, term_stats

    ds = doc_stats(docs, text_col, key)
    n, avgdl = corpus_stats(ds)
    p = build_postings(docs, text_col, key)
    ts = term_stats(p)
    scored = score_queries(p, ds, ts, queries, n, avgdl, key)
    return topk(scored, k, key)
