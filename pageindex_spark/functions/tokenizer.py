"""Deterministic tokenizer shared by the Spark engine and the pytest oracle.

Reference parity: PageIndex counts tokens with tiktoken ``cl100k_base``
(``/root/reference/pageindex/utils.py:23-31``, ``count_tokens``). The target
engine needs *index terms*, not BPE ids, so the tokenizer is a plain
lowercase-alphanumeric word splitter — the classic IR choice — expressible
identically in three places:

* pure Python (this module; used by the oracle and by Arrow-batch UDFs),
* Spark SQL / DuckDB SQL (``functions/sqlglue.py`` SPARK_TERMS/DUCK_TERMS),
* Arrow compute (``operators/spimi._tokenize_arrow``): RE2 replace + lower +
  split — the SEGMENT BUILDER's tokenizer, whose tf/doc_len feed the index
  blobs and block-max bounds.

The FOUR MUST stay in lockstep — rank identity of BM25 scores depends on it.
(Round 5: the Spark SQL side now EXTRACTS the positive class
`[A-Za-z0-9]+` then lowercases — equivalent by construction since ASCII
case folding commutes with extraction, and 6-23x faster because JDK 17's
negated-char-class predicate lambda anti-scales with executor threads; see
``sqlglue.SPARK_TERMS``. The count-only ``SPARK_TERM_COUNT`` form is a
fifth lockstep-pinned expression used for doc_len.)

Lockstep is NOT just a shared regex: the engines' lowercase implementations
(Python str.lower / JVM Lower / Arrow utf8proc / DuckDB) disagree on exotic
Unicode case mappings — measured in this repo: Turkish İ (U+0130) lowers to
'i' + COMBINING DOT ABOVE in Python/JVM (a token BOUNDARY under the ASCII
alphabet) but to a bare 'i' in Arrow's utf8_lower (token continues), so
"İstanbul" tokenized as ['i','stanbul'] vs ['istanbul']. The fix is order
of operations: STRIP to the ASCII alphabet FIRST (``ASCII_SEP_PATTERN`` —
pure codepoint-class match, no case semantics), THEN lowercase, which only
ever sees [A-Za-z0-9 ] where every engine agrees. Tokens are therefore the
maximal ASCII-alphanumeric runs of the raw text, lowercased; non-ASCII
letters are separators by definition. ``tests/test_tokenizer_lockstep.py``'s
adversarial-Unicode property test pins all four implementations on exactly
these characters; extend it before ever widening the token alphabet.
"""

from __future__ import annotations

import re

# Pre-lowercase separator collapse: any run outside the ASCII alphabet.
ASCII_SEP_PATTERN = "[^A-Za-z0-9]+"
# Post-lowercase split (only ever applied to [a-z0-9 ] text).
TOKEN_SPLIT_PATTERN = "[^a-z0-9]+"
TOKEN_SPLIT_RE = re.compile(TOKEN_SPLIT_PATTERN)
_TOKEN_RE = re.compile("[A-Za-z0-9]+")

# BM25 constants fixed by BASELINE.json north_star.
BM25_K1 = 1.2
BM25_B = 0.75


def tokenize(text: str) -> list[str]:
    """Maximal ASCII-alphanumeric runs, lowercased (see module docstring:
    equivalent to strip-to-ASCII -> lower -> split in every engine)."""
    if not text:
        return []
    return [t.lower() for t in _TOKEN_RE.findall(text)]


def token_count(text: str) -> int:
    return len(tokenize(text))


_BOOST_RE = re.compile(r"^(.+)\^(\d+(?:\.\d+)?)$")


def parse_boost_query(text: str) -> tuple[str, dict[str, float]]:
    """Split a query into (text without boosts, {term: weight}): a word with
    a TRAILING '^<number>' (classic Lucene 'term^2.5' syntax) weights that
    word's terms; the word itself stays in the query. Negated words
    ('-term^2') keep their boost suffix stripped but exclusion never scores,
    so the weight is ignored downstream. A term boosted twice takes the LAST
    weight. Shared by the Spark engine (plans/query.py) and the SQL-twin
    generator (driverq) — same lockstep rule as ``tokenize``."""
    if "^" not in text:
        return text, {}
    words: list[str] = []
    weights: dict[str, float] = {}
    for w in text.split():
        m = _BOOST_RE.match(w)
        if m:
            bare = m.group(1)
            words.append(bare)
            if not bare.startswith("-"):
                wt = float(m.group(2))
                if wt <= 0.0:
                    # boost 0 would let BMW (upper bound 0 -> prunable) and
                    # the dense verifier (matched at score 0) legitimately
                    # disagree on tie-filling; reject rather than diverge.
                    raise ValueError(f"boost must be > 0: {w!r}")
                for t in tokenize(bare):
                    weights[t] = wt
        else:
            words.append(w)
    return " ".join(words), weights


def parse_prefix_query(text: str) -> tuple[list[str], list[str]]:
    """Split a query into (literal words, prefix stems): a whitespace word
    with a TRAILING '*' is a prefix pattern (classic 'term*' wildcard
    syntax); its stem must tokenize to exactly one term. Literal words pass
    through untouched (including '-term' negations — ``parse_query`` handles
    those downstream). Shared by the Spark engine (plans/query.py
    ``search_prefix``) and the SQL-twin generator (driverq) so both parse
    prefix queries identically — the same lockstep rule as ``tokenize``."""
    lits: list[str] = []
    stems: list[str] = []
    for w in text.split():
        if len(w) > 1 and w.endswith("*") and not w.startswith("-"):
            toks = tokenize(w[:-1])
            if len(toks) != 1:
                raise ValueError(
                    f"prefix stem {w[:-1]!r} must be a single token, got {toks}"
                )
            stems.append(toks[0])
        elif w != "*":
            lits.append(w)
    return lits, sorted(set(stems))


_WILD_OK_RE = re.compile(r"^[A-Za-z0-9*?]+$")


def parse_wildcard_query(text: str) -> tuple[list[str], list[str]]:
    """Split a query into (literal words, wildcard patterns): a whitespace
    word containing '*' (any chars) or '?' (exactly one char) ANYWHERE is a
    wildcard pattern (classic Lucene WildcardQuery 'te*m' / 't?rm' syntax —
    a strict generalization of ``parse_prefix_query``'s trailing-'*').
    Patterns lowercase like tokens do; their literal characters must be
    ASCII alphanumeric (the token alphabet — anything else could never match
    an index term, so it raises rather than silently matching nothing).
    Literal words pass through untouched (including '-term' negations);
    negated words never expand — Lucene doesn't rewrite exclusions either.
    Shared by the Spark engine (plans/query.py ``search_wildcard``) and the
    SQL-twin generator (driverq) — the same lockstep rule as ``tokenize``."""
    lits: list[str] = []
    pats: list[str] = []
    for w in text.split():
        if ("*" in w or "?" in w) and not w.startswith("-"):
            if not _WILD_OK_RE.match(w):
                raise ValueError(
                    f"wildcard pattern {w!r} may only contain [A-Za-z0-9*?]"
                )
            if w.strip("*?"):
                pats.append(w.lower())
            # all-wildcard words ('*', '??') are noise, like bare '*' in
            # parse_prefix_query — matching the whole vocabulary is never
            # what a user meant; they drop.
        else:
            lits.append(w)
    return lits, sorted(set(pats))


def wildcard_regex(pattern: str) -> str:
    """The anchored regex a wildcard pattern compiles to — '*' matches any
    run of token characters, '?' exactly one. Token characters are [a-z0-9]
    by construction (``tokenize``), so no escaping is ever needed and the
    SAME string evaluates identically under Python ``re``, Java regex
    (Spark ``rlike``) and RE2 (DuckDB ``regexp_matches``) — the lockstep
    property the wildcard SQL twin depends on."""
    return (
        "^"
        + pattern.replace("*", "[a-z0-9]*").replace("?", "[a-z0-9]")
        + "$"
    )


def wildcard_prefix(pattern: str) -> str:
    """The literal prefix before the first wildcard char ('' when the
    pattern starts with one): the part of a wildcard a parquet scan can
    push down as StringStartsWith before the regex verifies."""
    for i, c in enumerate(pattern):
        if c in "*?":
            return pattern[:i]
    return pattern


def expand_synonyms(text: str, synonyms: dict[str, list[str]]) -> str:
    """Query-time synonym expansion (Lucene SynonymGraphFilter applied at
    query time, expand=true): each POSITIVE query token expands to itself
    plus its mapped synonyms — one hop, no transitivity (an explicit
    mapping is applied as listed, never chained). '-term' negations pass
    through untouched (exclusions are literal — the same rule as the
    wildcard/prefix parsers, and Lucene never rewrites exclusions).
    Mapping keys and values must each be a single index-alphabet token
    (anything else could never match an index term — raise loudly rather
    than silently matching nothing). Shared by the Spark engine
    (plans/query.py ``search_synonyms``) and the SQL-twin generator
    (driverq) — the same lockstep rule as ``tokenize``."""
    for key, vals in synonyms.items():
        if tokenize(key) != [key]:
            raise ValueError(f"synonym key {key!r} is not a single token")
        for v in vals:
            if tokenize(v) != [v]:
                raise ValueError(
                    f"synonym value {v!r} (for {key!r}) is not a single token"
                )
    out: list[str] = []
    for w in text.split():
        if w.startswith("-"):
            out.append(w)
            continue
        for t in tokenize(w):
            out.append(t)
            out.extend(synonyms.get(t, []))
    return " ".join(out)


def parse_query(text: str) -> tuple[str, list[str]]:
    """Split a query into (positive text, negated terms): a whitespace word
    with a LEADING '-' is an exclusion (classic '-term' boolean-NOT syntax —
    the reference has no query language at all, its retrieval is an LLM
    prompt over the tree). In-word hyphens ('well-known') are untouched, and
    a bare '-' is dropped as noise. Shared by the Spark engine and the pure-
    Python oracle so both parse queries identically (same lockstep rule as
    ``tokenize`` itself)."""
    if "-" not in text:
        return text, []
    pos_words: list[str] = []
    neg_terms: list[str] = []
    for w in text.split():
        if len(w) > 1 and w.startswith("-"):
            neg_terms.extend(tokenize(w[1:]))
        elif w != "-":
            pos_words.append(w)
    return " ".join(pos_words), sorted(set(neg_terms))


def parse_query_string(text: str) -> dict:
    """Parse the Lucene ``query_string`` mini-language into its clause
    structure — the single shared grammar for the engine
    (``plans/query.py search_query_string``), the pure-Python pytest
    oracle, and the SQL-twin generator (``driverq._query_string_sql``),
    same lockstep rule as ``tokenize``. Supported syntax, composing the
    surfaces that already exist individually:

    * ``term``        — SHOULD clause (scored, optional; OR semantics)
    * ``term^2.5``    — boost (weight multiplies the term's idf)
    * ``+term``       — MUST clause (scored AND required)
    * ``-term``       — MUST_NOT clause (excluded; never scored)
    * ``"a b c"``     — required phrase: contiguous in-order match. Its
                        terms are promoted to MUST clauses (scored at
                        weight 1.0 unless explicitly boosted elsewhere) —
                        the same BM25-over-phrase-terms scoring as
                        ``search_phrase``, NOT Lucene's phrase-frequency
                        scoring (the index is bag-of-words; phrase tf only
                        exists at the verify stage).
    * ``-"a b"``      — negated phrase: docs containing it contiguously
                        are excluded; its terms neither score nor filter.
    * ``term*``       — prefix clause: expands against the term dictionary
                        to SHOULD clauses at weight 1.0 (Lucene's scoring
                        BooleanQuery rewrite; an expansion colliding with
                        an explicit clause keeps the explicit weight).

    Returns ``{"weights": {term: w} (explicit should+must clauses),
    "must": sorted terms, "neg": sorted terms, "phrases": [[t1,..],..],
    "neg_phrases": [[..],..], "prefixes": sorted stems}``. A word may
    tokenize to several terms ("well-known"); each inherits the clause's
    role and weight. Raises on: a term given two DIFFERENT weights, a
    negated or boosted prefix (``-te*``/``te*^2`` — the expansion set
    would be dictionary-dependent in a way neither twin can mirror
    cheaply), boost <= 0 (same BMW-vs-dense tie divergence as
    ``parse_boost_query``), an unterminated quote, and a query with no
    scorable clause (nothing to rank by)."""
    weights: dict[str, float] = {}
    must: set[str] = set()
    neg: set[str] = set()
    phrases: list[list[str]] = []
    neg_phrases: list[list[str]] = []
    prefixes: set[str] = set()

    def _weigh(term: str, w: float) -> None:
        if term in weights and weights[term] != w:
            raise ValueError(
                f"term {term!r} assigned two weights "
                f"({weights[term]!r} and {w!r})"
            )
        weights[term] = w

    # clause scan: quoted runs are single clauses (with optional +/- sign);
    # everything else splits on whitespace.
    i, n = 0, len(text)
    clauses: list[tuple[str, str]] = []  # (sign, body) / ("Q"+sign, phrase)
    while i < n:
        if text[i].isspace():
            i += 1
            continue
        sign = ""
        if text[i] in "+-" and i + 1 < n and not text[i + 1].isspace():
            sign = text[i]
            i += 1
        if i < n and text[i] == '"':
            j = text.find('"', i + 1)
            if j < 0:
                raise ValueError(f"unterminated quote in query: {text!r}")
            clauses.append(("Q" + sign, text[i + 1:j]))
            i = j + 1
        else:
            j = i
            while j < n and not text[j].isspace():
                j += 1
            clauses.append((sign, text[i:j]))
            i = j

    for sign, body in clauses:
        if sign.startswith("Q"):
            toks = tokenize(body)
            if not toks:
                continue  # empty/noise phrase
            if sign == "Q-":
                neg_phrases.append(toks)
            else:
                phrases.append(toks)
            continue
        if sign == "-":
            neg.update(tokenize(body))
            continue
        m = _BOOST_RE.match(body)
        w = 1.0
        if m:
            body, w = m.group(1), float(m.group(2))
            if w <= 0.0:
                raise ValueError(f"boost must be > 0: {body!r}^{w!r}")
        if body.endswith("*") and len(body) > 1:
            if sign == "+" or m:
                raise ValueError(
                    f"prefix clause {body!r} cannot be required or boosted"
                )
            toks = tokenize(body[:-1])
            if len(toks) != 1:
                raise ValueError(
                    f"prefix stem {body[:-1]!r} must be a single token, "
                    f"got {toks}"
                )
            prefixes.add(toks[0])
            continue
        for t in tokenize(body):
            _weigh(t, w)
            if sign == "+":
                must.add(t)

    for p in phrases:  # phrase terms: scored + required (see docstring)
        for t in p:
            if t not in weights:
                weights[t] = 1.0
            must.add(t)
    if not weights and not prefixes:
        raise ValueError(f"query has no scorable clause: {text!r}")
    return {
        "weights": weights,
        "must": sorted(must),
        "neg": sorted(neg),
        "phrases": phrases,
        "neg_phrases": neg_phrases,
        "prefixes": sorted(prefixes),
    }
