"""Extraction + tokenization stages (SURVEY.md §2.3 rows 1-2).

Reference parity: PDF page scan + token counting
(``/root/reference/pageindex/utils.py:417-440`` and ``utils.py:23-31``)
become columnar stages over the documents DataFrame:

* ``with_extracted_text``: ``html binary -> text string`` via an Arrow-batched
  iterator UDF (``mapInArrow``-style ``pandas_udf``) applying the SAME pure
  function the pytest oracle uses — byte-identical per url by construction.
* ``with_terms`` / ``with_doc_len``: tokenization kept **JVM-side**
  (whole-stage-codegen'd, no Python at all) via the locked
  ``sqlglue.SPARK_TERMS`` expression — the single SQL tokenizer shared with
  the DuckDB oracle twins. The Python ``tokenize`` is the oracle's mirror.

At 100 TB the ``html`` column dominates I/O: both helpers select/prune so a
query that only needs ``text`` never deserializes ``html`` (column pruning is
preserved — check ``ReadSchema`` in the plan).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..functions.extraction import extract_text
from ..functions.sqlglue import spark_terms


@F.pandas_udf(StringType())
def _extract_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    # Iterator form: one Arrow batch in, one out; no per-row Python dispatch
    # overhead beyond the string transform itself.
    for s in batches:
        yield s.map(extract_text)


def with_extracted_text(docs: DataFrame, out_col: str = "text") -> DataFrame:
    """documents(html binary, ...) -> + text string (byte-identical per url)."""
    return docs.withColumn(out_col, _extract_udf(F.col("html")))


def terms_col(text_col: str = "text") -> Column:
    """JVM-side tokenizer: array<string> of non-empty lowercase tokens.

    Delegates to the ONE locked SQL tokenizer (``sqlglue.SPARK_TERMS``) so
    the DataFrame API shares the ASCII-strip-first discipline of the other
    implementations (see ``functions/tokenizer.py`` docstring; pinned by
    ``tests/test_tokenizer_lockstep.py``). Do NOT re-implement split/lower
    here — a bare ``split(lower(text))`` diverges on U+0130 et al."""
    return F.expr(spark_terms(text_col))


def with_terms(docs: DataFrame, text_col: str = "text", out_col: str = "terms") -> DataFrame:
    return docs.withColumn(out_col, terms_col(text_col))


def with_doc_len(docs: DataFrame, terms_col_name: str = "terms", out_col: str = "doc_len") -> DataFrame:
    return docs.withColumn(out_col, F.size(F.col(terms_col_name)).cast("long"))
