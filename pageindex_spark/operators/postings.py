"""Relational (uncompressed) postings + corpus statistics.

This is build-plan step 2 (SURVEY.md §7): the minimum end-to-end index as
plain DataFrame rows — entirely built-in operators, every stage expressible
in ANSI SQL so the DuckDB driver oracle can verify it. The SPIMI/varbyte path
(``spimi.py``) replaces it for scale; this module remains both the semantic
spec and the cross-check.

Reference parity mapping (SURVEY.md §2.1):
* #2 token counter        -> ``doc_stats`` (url, doc_len)
* #16 mode/argmax agg     -> (pattern reused for heavy-hitter detection)
* #17 sum aggregate       -> ``corpus_stats`` (N, avgdl)
* #19 distinct key-set    -> ``term_stats`` df = count(distinct doc)
* #37 range/text join     -> topk join back to documents for text

Shuffle accounting (100 TB lens):
* ``postings``: one shuffle — explode is map-side; groupBy(url, term) does a
  partial (map-side combine) then final agg. Catalyst handles both.
* ``term_stats``: computed FROM postings (already one row per (term, doc)) so
  df = count(*) per term — a second, much smaller shuffle over term only.
* ``corpus_stats``: single global agg, partials per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .extract import terms_col


def explode_terms(docs: DataFrame, text_col: str = "text", key: str = "url") -> DataFrame:
    """(key, text) -> one row per token occurrence (key, term)."""
    return docs.select(key, F.explode(terms_col(text_col)).alias("term"))


def doc_stats(docs: DataFrame, text_col: str = "text", key: str = "url") -> DataFrame:
    """(key, doc_len) — token count per document; JVM-side only."""
    return docs.select(
        key, F.size(terms_col(text_col)).cast("long").alias("doc_len")
    )


def corpus_stats(stats: DataFrame) -> tuple[int, float]:
    """(N, avgdl) collected as driver scalars (broadcast literals downstream)."""
    row = stats.agg(
        F.count("*").alias("n_docs"), F.avg("doc_len").alias("avgdl")
    ).collect()[0]
    return int(row["n_docs"]), float(row["avgdl"])


def build_postings(docs: DataFrame, text_col: str = "text", key: str = "url") -> DataFrame:
    """Uncompressed postings: (term, key, tf). One shuffle on (key, term)."""
    return (
        explode_terms(docs, text_col, key)
        .groupBy("term", key)
        .agg(F.count("*").alias("tf"))
    )


def term_stats(postings: DataFrame) -> DataFrame:
    """(term, df) — document frequency; postings are already distinct per
    (term, doc) so this is a plain count."""
    return postings.groupBy("term").agg(F.count("*").alias("df"))
