"""Extraction + tokenization stages (SURVEY.md §2.3 rows 1-2).

Reference parity: PDF page scan + token counting
(``/root/reference/pageindex/utils.py:417-440`` and ``utils.py:23-31``)
become columnar stages over the documents DataFrame:

* ``with_extracted_text``: ``html binary -> text string`` via an Arrow-batched
  iterator UDF (``mapInArrow``-style ``pandas_udf``) applying the SAME pure
  function the pytest oracle uses — byte-identical per url by construction.
* ``with_terms`` / ``with_doc_len``: tokenization kept **JVM-side**
  (``F.split`` + ``F.filter`` lambda — whole-stage-codegen'd, no Python at
  all) because the token pattern is a plain regex. The Python ``tokenize``
  is only the oracle's mirror of the same pattern.

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
from ..functions.tokenizer import TOKEN_SPLIT_PATTERN


@F.pandas_udf(StringType())
def _extract_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    # Iterator form: one Arrow batch in, one out; no per-row Python dispatch
    # overhead beyond the string transform itself.
    for s in batches:
        yield s.map(extract_text)


def with_extracted_text(docs: DataFrame, out_col: str = "text") -> DataFrame:
    """documents(html binary, ...) -> + text string (byte-identical per url)."""
    return docs.withColumn(out_col, _extract_udf(F.col("html")))


def terms_col(text_col: str | Column = "text") -> Column:
    """JVM-side tokenizer: array<string> of non-empty lowercase tokens.

    ``array_remove(..., '')`` rather than a higher-order ``filter`` lambda:
    HOFs fall out of whole-stage codegen in Spark, array_remove does not
    (verified via .explain; semantics identical — '' is the only junk token
    the split can produce)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.array_remove(F.split(F.lower(c), TOKEN_SPLIT_PATTERN), "")


def with_terms(docs: DataFrame, text_col: str = "text", out_col: str = "terms") -> DataFrame:
    return docs.withColumn(out_col, terms_col(text_col))


def with_doc_len(docs: DataFrame, terms_col_name: str = "terms", out_col: str = "doc_len") -> DataFrame:
    return docs.withColumn(out_col, F.size(F.col(terms_col_name)).cast("long"))
