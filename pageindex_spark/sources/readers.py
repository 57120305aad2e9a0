"""Generic corpus ingestion: get (url, text) rows out of whatever a user has.

The reference ingests PDFs one file at a time
(/root/reference/pageindex/utils.py:417-440, PyMuPDF page scan); the target
engine's unit of ingestion is a DataFrame of documents, so the sources story
is "read your corpus in any columnar/text layout, normalize to the corpus
schema, hand it to build_index / segment_batch". Everything here is a thin
declarative veneer over spark.read — Catalyst keeps column pruning and
pushdown; the only compute is the optional Arrow-batched HTML extraction
(`operators/extract.with_extracted_text`, the same path the engine's own
tables use, byte-identical per url).

Formats:
- parquet / json (JSON-lines) / csv (header row expected) — named columns,
  remapped via ``url_col``/``text_col``/``html_col``;
- tsv — headerless two-column ``url<TAB>text`` (the WET/CC-style dump
  layout); a plain one-doc-per-line text file has NO stable distributed
  line identity, so it is deliberately unsupported — demand a url column
  rather than silently inventing unstable docIDs (docID order == url order
  is a correctness invariant, CLAUDE.md).

Dedup/validation stay out of the reader: exact/near dedup are first-class
operators (operators/dedup.py) a pipeline applies BEFORE indexing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FORMATS = ("parquet", "json", "csv", "tsv")


def read_corpus(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    url_col: str = "url",
    text_col: str = "text",
    html_col: str | None = None,
    validate: bool = True,
) -> DataFrame:
    """-> (url string, text string), ready for ``build_index`` /
    ``segment_batch``. With ``html_col`` set, text is EXTRACTED from that
    raw-HTML column instead of read from ``text_col`` (Arrow-batched, the
    engine's own extraction — oracle-pinned byte identity). Rows with a
    null/empty url are rejected loudly: urls are the engine's document
    identity (docID order == url order). The check is one extra
    url-column-only scan (column-pruned — a sliver of the corpus bytes);
    pass ``validate=False`` for trusted inputs to skip it."""
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {_FORMATS}, got {fmt!r}")
    if fmt == "parquet":
        df = spark.read.parquet(path)
    elif fmt == "json":
        df = spark.read.json(path)
    elif fmt == "csv":
        # multiLine: document text legitimately embeds newlines; the writer
        # quotes them, the reader must be told to honor the quotes.
        df = (
            spark.read.option("header", "true")
            .option("multiLine", "true")
            .csv(path)
        )
    else:  # tsv: headerless url<TAB>text, STRICTLY one doc per line (the
        # WET/CC dump layout — embedded newlines/tabs are not representable;
        # use csv/json/parquet for free-form text)
        df = (
            spark.read.option("sep", "\t")
            .schema("url string, text string")
            .csv(path)
        )
        url_col, text_col = "url", "text"

    if html_col is not None:
        from ..operators.extract import with_extracted_text

        df = df.withColumnRenamed(html_col, "html") if html_col != "html" else df
        df = with_extracted_text(df)
        text_expr = F.col("text")
    else:
        text_expr = F.col(text_col).cast("string")
    out = df.select(
        F.col(url_col).cast("string").alias("url"), text_expr.alias("text")
    )
    if validate:
        n_bad = out.filter(F.col("url").isNull() | (F.col("url") == "")).count()
        if n_bad:
            raise ValueError(
                f"{n_bad} rows have a null/empty {url_col!r} — urls are "
                "document identity (docID order == url order); fix the "
                "input, don't index it"
            )
    return out
