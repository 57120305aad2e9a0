"""Text-analysis operators for large-scale training-data pipelines:
language-ID heuristic, quality scoring, token counting, fingerprinting.

All operators are pure JVM-side expressions (whole-stage codegen, no Python)
and have exact DuckDB oracle twins in ``__spark_entry__.oracle_sql`` built
from the same ``sqlglue`` snippets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.sqlglue import spark_terms

# Deterministic marker lexicons for the language-ID vote. Tiny on purpose —
# a real deployment swaps in proper n-gram tables; the *operator shape*
# (per-language score -> argmax with deterministic tie-break) is what scales.
LANG_MARKERS = {
    "en": ["the", "of", "and", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "que", "de", "y"],
}

# Stopword-like head used by the quality score (fraction of very common words).
STOPWORDS = ["the", "of", "and", "to", "a", "in", "is", "it", "data", "for"]


def with_terms_expr(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn("terms", F.expr(spark_terms(text_col)))


def token_count(docs: DataFrame, key: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(key, n_tokens) — whitespace/regex token count, JVM-side."""
    return docs.select(
        key, F.size(F.expr(spark_terms(text_col))).cast("long").alias("n_tokens")
    )


# BPE-ish subword pattern: alnum chunks of <= 4 chars + each non-alnum
# non-space symbol as its own piece — the standard cheap estimator for
# "how many LLM tokens is this corpus" capacity planning. No backslash
# classes: Spark SQL string literals process \-escapes, DuckDB's don't,
# so a pattern with them would silently diverge between the twins.
BPE_PATTERN = "[a-z0-9]{1,4}|[^a-z0-9 ]"


def token_estimates(
    docs: DataFrame, key: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(key, ws_tokens, bpe_tokens): whitespace token count + the BPE-ish
    subword estimate. Pure JVM regex (codegen), one pass per column."""
    ws = F.size(F.expr(f"regexp_extract_all({text_col}, '[^ ]+', 0)"))
    bpe = F.size(
        F.expr(f"regexp_extract_all(lower({text_col}), '{BPE_PATTERN}', 0)")
    )
    return docs.select(
        key,
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_tokens"),
    )


def quality_score(docs: DataFrame, key: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(key, n_tokens, alpha_ratio6, stop_ratio6, avg_token_len6).

    Ratios are fixed-point (x1e6) bigints for engine-agnostic hashing:
    * alpha_ratio — alphanumeric chars / total chars,
    * stop_ratio  — stopword tokens / tokens,
    * avg_token_len — mean token length.
    """
    terms = F.expr(spark_terms(text_col))
    n_tok = F.size(terms)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(terms, lambda t: F.array_contains(stop_arr, t)))
    # ASCII-alnum count: no lowercase involved -> engine-independent.
    # Counted via the POSITIVE char class (len - len(alnum runs removed)):
    # JDK 17's negated-class path is ~6x slower per byte and anti-scales
    # with threads (r5 tokenizer root cause — sqlglue.SPARK_TERMS).
    alpha_chars = F.length(text_col) - F.length(
        F.regexp_replace(text_col, "[A-Za-z0-9]+", "")
    )
    total_chars = F.length(text_col)
    fix6 = lambda c: F.floor(c * 1_000_000).cast("long")  # noqa: E731
    return docs.select(
        key,
        n_tok.cast("long").alias("n_tokens"),
        fix6(alpha_chars / total_chars).alias("alpha_ratio6"),
        fix6(n_stop / n_tok).alias("stop_ratio6"),
        fix6((F.length(F.array_join(terms, "")) / n_tok)).alias("avg_token_len6"),
    )


def lang_id(docs: DataFrame, key: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(key, lang_guess) — marker-word vote, argmax with lang-code tie-break."""
    terms = F.expr(spark_terms(text_col))

    def _count(markers):
        arr = F.array(*[F.lit(m) for m in markers])
        return F.size(F.filter(terms, lambda t: F.array_contains(arr, t)))

    scores = [(lang, _count(markers)) for lang, markers in sorted(LANG_MARKERS.items())]
    # argmax by (count desc, lang asc): build struct array and array_max
    packed = F.array(
        *[F.struct(cnt.alias("cnt"), F.lit(lang).alias("neg")) for lang, cnt in scores]
    )
    # array_max on struct compares fields in order; to get lang ASC on ties we
    # compare (cnt, reversed-lang) — encode lang order via its negative rank.
    ranked = F.array(
        *[
            F.struct(
                cnt.alias("cnt"),
                F.lit(-i).alias("ord"),
                F.lit(lang).alias("lang"),
            )
            for i, (lang, cnt) in enumerate(scores)
        ]
    )
    return docs.select(key, F.array_max(ranked).getField("lang").alias("lang_guess"))


def fingerprint(docs: DataFrame, key: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(key, fp) — md5 of whitespace-normalized lowercase text (document
    fingerprint; the rolling-hash analogue with an exact SQL twin)."""
    from ..functions.sqlglue import SPARK_FP_NORM

    return docs.select(
        key, F.md5(F.expr(SPARK_FP_NORM.format(col=text_col))).alias("fp")
    )
