"""Deterministic tokenizer shared by the Spark engine and the pytest oracle.

Reference parity: PageIndex counts tokens with tiktoken ``cl100k_base``
(``/root/reference/pageindex/utils.py:23-31``, ``count_tokens``). The target
engine needs *index terms*, not BPE ids, so the tokenizer is a plain
lowercase-alphanumeric word splitter — the classic IR choice — expressible
identically in three places:

* pure Python (this module; used by the oracle and by Arrow-batch UDFs),
* Spark SQL: ``filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')``,
* DuckDB SQL: ``list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')``.

The three MUST stay in lockstep — rank identity of BM25 scores depends on it.
`TOKEN_SPLIT_RE` is the single source of truth for the split pattern.
"""

from __future__ import annotations

import re

# Split on any run of characters outside [a-z0-9] after lowercasing.
TOKEN_SPLIT_PATTERN = "[^a-z0-9]+"
TOKEN_SPLIT_RE = re.compile(TOKEN_SPLIT_PATTERN)

# BM25 constants fixed by BASELINE.json north_star.
BM25_K1 = 1.2
BM25_B = 0.75


def tokenize(text: str) -> list[str]:
    """Lowercase alphanumeric word split; '' tokens dropped."""
    if not text:
        return []
    return [t for t in TOKEN_SPLIT_RE.split(text.lower()) if t]


def token_count(text: str) -> int:
    return len(tokenize(text))
