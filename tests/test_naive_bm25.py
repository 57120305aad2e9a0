"""End-to-end slice (SURVEY.md §7 step 2): extraction byte-identity +
naive relational BM25 rank-identity vs the pure-Python oracle at sf-unit."""

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from pageindex_spark.operators.bm25 import bm25_topk_relational
from pageindex_spark.operators.docids import assign_doc_ids
from pageindex_spark.operators.extract import with_extracted_text
from pageindex_spark.oracle import bm25_topk
from pageindex_spark.sources.corpus import make_queries


@pytest.fixture(scope="module")
def docs(spark, sf_unit_dir):
    return spark.read.parquet(os.path.join(sf_unit_dir, "documents.parquet"))


def test_extraction_byte_identity(spark, docs):
    """Per-row invariant (BASELINE.json input_hint): UDF-extracted text is
    byte-identical to the ground-truth text column for EVERY row."""
    extracted = with_extracted_text(docs.select("url", "html"), out_col="etext")
    mismatches = (
        extracted.join(docs.select("url", "text"), "url")
        .filter(F.col("etext") != F.col("text"))
        .count()
    )
    assert mismatches == 0


def test_doc_id_assignment_dense_and_url_ordered(spark, docs):
    dm, offsets = assign_doc_ids(docs.select("url"), num_partitions=8)
    rows = dm.orderBy("doc_id").collect()
    n = docs.count()
    assert [r["doc_id"] for r in rows] == list(range(n))
    urls = [r["url"] for r in rows]
    assert urls == sorted(urls)
    # offsets form the docID grid: partition p holds [offsets[p], offsets[p+1])
    assert offsets[0] == 0 and len(offsets) == 8
    for r in rows:
        p = r["part_id"]
        hi = offsets[p + 1] if p + 1 < len(offsets) else n
        assert offsets[p] <= r["doc_id"] < hi


def test_naive_bm25_rank_identity(spark, docs, sf_unit_dir):
    tbl = pq.read_table(os.path.join(sf_unit_dir, "documents.parquet"), columns=["url", "text"])
    oracle_rows = list(zip(tbl["url"].to_pylist(), tbl["text"].to_pylist()))
    queries = make_queries()
    golden = bm25_topk(oracle_rows, queries, k=10)

    qdf = spark.createDataFrame(queries, "query_id int, query_text string")
    got = (
        bm25_topk_relational(docs.select("url", "text"), qdf, k=10)
        .orderBy("query_id", "rank")
        .collect()
    )
    assert len(got) == len(golden)
    for g, (qid, rank, url, score) in zip(got, golden):
        assert (g["query_id"], g["rank"], g["url"]) == (qid, rank, url)
        assert abs(g["score"] - score) < 1e-9, (qid, url, g["score"], score)


def test_naive_bm25_rank_identity_non_ascii(spark):
    """VERDICT r2 'what's wrong' #1: the naive DataFrame path must share the
    ASCII-strip-first tokenizer. On 'İstanbul' the old split(lower(text))
    yielded ['i','stanbul'] vs the locked ['stanbul'] — this corpus is built
    from exactly the adversarial strings that used to desync the engines."""
    rows = [
        ("u01", "Turkish İstanbul Iı dotted city stanbul guide"),
        ("u02", "straße STRASSE ẞ sharp strasse walking tour"),
        ("u03", "ﬁle ﬂow ligatures file flow systems manual"),
        ("u04", "K kelvin sign Å angstrom sign units table"),
        ("u05", "Greek ΣIGMA σ final ς igma summation notes"),
        ("u06", "plain ascii stanbul city guide reference text"),
        ("u07", "plain ascii strasse tour reference text extra words here"),
        ("u08", "áccent é combining á é accent handling faq"),
    ]
    queries = [(1, "İstanbul"), (2, "stanbul city"), (3, "straße tour"),
               (4, "ﬁle systems"), (5, "igma"), (6, "é accent")]

    golden = bm25_topk(rows, queries, k=5)

    docs_df = spark.createDataFrame(rows, "url string, text string")
    qdf = spark.createDataFrame(queries, "query_id int, query_text string")
    got = (
        bm25_topk_relational(docs_df, qdf, k=5)
        .orderBy("query_id", "rank")
        .collect()
    )
    assert len(got) == len(golden)
    for g, (qid, rank, url, score) in zip(got, golden):
        assert (g["query_id"], g["rank"], g["url"]) == (qid, rank, url)
        assert abs(g["score"] - score) < 1e-9, (qid, url, g["score"], score)
