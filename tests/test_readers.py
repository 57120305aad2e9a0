"""sources/readers.py: any supported layout normalizes to the SAME corpus
frame, and an index built from it is search-identical to the parquet path."""

import os

import pytest
from pyspark.sql import functions as F

from pageindex_spark.sources.corpus import make_documents
from pageindex_spark.sources.readers import read_corpus


@pytest.fixture(scope="module")
def corpus_files(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("readers"))
    c = make_documents(120, seed=7)
    df = spark.createDataFrame(
        list(zip(c.url, c.text)), "url string, text string"
    )
    df.write.parquet(os.path.join(base, "pq"))
    df.write.json(os.path.join(base, "jsonl"))
    df.write.option("header", "true").csv(os.path.join(base, "csv"))
    # tsv is the one-doc-per-LINE dump layout: no embedded newlines/tabs
    flat = df.withColumn(
        "text", F.regexp_replace("text", "[\\n\\t]+", " ")
    )
    flat.write.option("sep", "\t").csv(os.path.join(base, "tsv"))
    want = sorted((r["url"], r["text"]) for r in df.collect())
    want_flat = sorted((r["url"], r["text"]) for r in flat.collect())
    return base, want, want_flat


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv", "tsv"])
def test_every_format_reads_identically(spark, corpus_files, fmt):
    base, want, want_flat = corpus_files
    sub = {"parquet": "pq", "json": "jsonl", "csv": "csv", "tsv": "tsv"}[fmt]
    got = read_corpus(spark, os.path.join(base, sub), fmt=fmt)
    assert got.columns == ["url", "text"]
    rows = sorted((r["url"], r["text"]) for r in got.collect())
    assert rows == (want_flat if fmt == "tsv" else want)


def test_column_remap_and_html_extraction(spark, corpus_files):
    """Renamed columns remap; an html column extracts byte-identically to
    the engine's own extraction path."""
    from pageindex_spark.functions.extraction import extract_text

    base, want, _flat = corpus_files
    html_rows = [
        (u, f"<html><body><p>{t}</p></body></html>".encode())
        for u, t in want[:30]
    ]
    df = spark.createDataFrame(html_rows, "link string, raw binary")
    p = os.path.join(base, "html_pq")
    df.write.parquet(p)
    got = read_corpus(spark, p, url_col="link", html_col="raw")
    rows = {r["url"]: r["text"] for r in got.collect()}
    for u, raw in html_rows:
        assert rows[u] == extract_text(raw)


def test_null_url_rejected_and_validate_opt_out(spark, corpus_files):
    base, _w, _f = corpus_files
    df = spark.createDataFrame(
        [("https://a.example/1", "ok"), (None, "orphan")],
        "url string, text string",
    )
    p = os.path.join(base, "bad_pq")
    df.write.parquet(p)
    with pytest.raises(ValueError, match="null/empty"):
        read_corpus(spark, p)
    assert read_corpus(spark, p, validate=False).count() == 2


def test_reader_to_index_search_identity(spark, corpus_files, tmp_path):
    """A jsonl-read corpus builds an index that scores rank+score identical
    to the parquet-read build of the same docs."""
    from pageindex_spark import build_index, search

    base, _w, _f = corpus_files
    out = {}
    for fmt, sub in (("parquet", "pq"), ("json", "jsonl")):
        idx = str(tmp_path / f"idx_{fmt}")
        build_index(
            spark, read_corpus(spark, os.path.join(base, sub), fmt=fmt),
            idx, num_partitions=4, n_buckets=4, n_seg_chunks=1,
            n_bucket_chunks=1,
        )
        out[fmt] = [
            tuple(r)
            for r in search(
                spark, idx, [(1, "ba ce"), (2, "di")], k=10
            ).collect()
        ]
    assert out["parquet"] == out["json"]
