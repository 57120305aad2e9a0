"""Deterministic HTML -> text extraction.

This single pure-Python module is imported by BOTH the Spark vectorized UDF
(`pageindex_spark.operators.extract`) and the pure-Python pytest oracle
(`pageindex_spark.oracle`), so the extracted ``text`` column is byte-identical
per ``url`` between the two — the per-row invariant required by
BASELINE.json ``input_hint``.

Reference parity: PageIndex's page scan (``/root/reference/pageindex/utils.py:417-440``,
``get_page_tokens``) turns one PDF page into ``(page_text, token_len)``. Here the
analogous stage turns one Common-Crawl-style HTML page (``html: binary``) into
``text: string``. The extractor is a small deterministic state-free function:

* drop ``<script>``/``<style>`` blocks entirely,
* drop known boilerplate containers (``<nav>``, ``<header>``, ``<footer>``,
  ``<div class="footer">``, ``<div class="sidebar">``),
* keep the inner text of ``<p>`` and ``<h1..h6>`` elements, in document order,
* join kept blocks with a single ``\n``.

No per-row Python runs on the Spark side: the UDF applies this function over
Arrow batches via pandas ``map`` inside a ``mapInArrow`` / ``pandas_udf``
(vectorized transport; the string transform itself is CPython either way, as
is true for any text extraction).
"""

from __future__ import annotations

import re

# Pre-compiled patterns — module-level so workers compile once per interpreter.
_DROP_BLOCKS = re.compile(
    r"<(script|style|nav|header|footer)\b[^>]*>.*?</\1>",
    re.DOTALL | re.IGNORECASE,
)
_DROP_DIVS = re.compile(
    r'<div\s+class="(?:footer|sidebar|ad|banner)"[^>]*>.*?</div>',
    re.DOTALL | re.IGNORECASE,
)
_KEEP_BLOCKS = re.compile(
    r"<(p|h[1-6])\b[^>]*>(.*?)</\1>",
    re.DOTALL | re.IGNORECASE,
)
_TAG = re.compile(r"<[^>]+>")


def extract_text(html: bytes | str) -> str:
    """Extract body text from an HTML page. Pure, deterministic, total.

    Returns '' for undecodable or empty input (never raises), so the Spark
    job and the oracle agree on every row including corrupt ones.
    """
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        try:
            html = bytes(html).decode("utf-8", errors="strict")
        except UnicodeDecodeError:
            html = bytes(html).decode("utf-8", errors="replace")
    html = _DROP_BLOCKS.sub("", html)
    html = _DROP_DIVS.sub("", html)
    blocks = []
    for _tag, inner in _KEEP_BLOCKS.findall(html):
        inner = _TAG.sub("", inner)
        blocks.append(inner.strip())
    return "\n".join(b for b in blocks if b)
