"""Pure-Python exhaustive BM25 oracle (SURVEY.md §5.2(1)).

Replaces the reference's golden-file regression (manual diff of
``/root/reference/results-original/*.json`` trees) with a computed golden:
a single-process, zero-Spark reference implementation using the SAME
extraction module and the SAME tokenizer as the engine. Pytest asserts the
Spark engine reproduces its top-k docIDs AND scores rank-identically.

Determinism contract:
* float64 throughout;
* per-document score accumulates query-term contributions in sorted unique
  term order (the engine does the same, so sums are bit-comparable);
* ties broken (score desc, url asc);
* duplicate query terms are deduplicated (documented: query tf is 1).
"""

from __future__ import annotations

import math
from collections import Counter

from ..functions.extraction import extract_text
from ..functions.tokenizer import BM25_B, BM25_K1, parse_query, tokenize


class OracleIndex:
    """In-memory inverted index over (url, html-or-text) rows."""

    def __init__(self, rows: list[tuple[str, object]], from_html: bool = False):
        # rows: (url, html bytes) if from_html else (url, text str)
        self.urls: list[str] = []
        self.doc_len: list[int] = []
        self.postings: dict[str, dict[int, int]] = {}
        for url, payload in sorted(rows, key=lambda r: r[0]):
            text = extract_text(payload) if from_html else payload
            terms = tokenize(text)
            did = len(self.urls)
            self.urls.append(url)
            self.doc_len.append(len(terms))
            for term, tf in Counter(terms).items():
                self.postings.setdefault(term, {})[did] = tf
        self.n_docs = len(self.urls)
        self.avgdl = (sum(self.doc_len) / self.n_docs) if self.n_docs else 0.0

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, {}))
        return math.log((self.n_docs - df + 0.5) / (df + 0.5) + 1.0)

    def score_all(
        self, query_text: str, k1: float = BM25_K1, b: float = BM25_B
    ) -> dict[int, float]:
        # '-term' boolean NOT (same parse as the engine: parse_query):
        # negated terms never score; docs containing any of them are
        # dropped AFTER scoring, so survivors keep identical scores.
        # k1/b default to the index-wide constants; overrides mirror the
        # engine's query-time similarity config (plans/query.py search).
        pos_text, neg_terms = parse_query(query_text)
        terms = sorted(set(tokenize(pos_text)))
        scores: dict[int, float] = {}
        for term in terms:
            plist = self.postings.get(term)
            if not plist:
                continue
            idf = self.idf(term)
            for did, tf in plist.items():
                dl = self.doc_len[did]
                denom = tf + k1 * (1.0 - b + b * dl / self.avgdl)
                contrib = idf * tf * (k1 + 1.0) / denom
                scores[did] = scores.get(did, 0.0) + contrib
        for term in neg_terms:
            for did in self.postings.get(term, {}):
                scores.pop(did, None)
        return scores

    def topk(
        self,
        query_text: str,
        k: int = 10,
        k1: float = BM25_K1,
        b: float = BM25_B,
    ) -> list[tuple[str, float]]:
        scores = self.score_all(query_text, k1=k1, b=b)
        ranked = sorted(
            scores.items(), key=lambda kv: (-kv[1], self.urls[kv[0]])
        )[:k]
        return [(self.urls[d], s) for d, s in ranked]


def bm25_topk(
    rows: list[tuple[str, object]],
    queries: list[tuple[int, str]],
    k: int = 10,
    from_html: bool = False,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> list[tuple[int, int, str, float]]:
    """Golden top-k table: (query_id, rank, url, score) — FIXTURES.md §3."""
    idx = OracleIndex(rows, from_html=from_html)
    out: list[tuple[int, int, str, float]] = []
    for qid, qtext in queries:
        for rank, (url, score) in enumerate(
            idx.topk(qtext, k, k1=k1, b=b), start=1
        ):
            out.append((qid, rank, url, score))
    return out


def _near_match_unordered(tokens: list[str], terms: list[str], slop: int) -> bool:
    """True when every term of ``terms`` (DISTINCT by contract) occurs
    within SOME window of ``slop + len(terms)`` tokens, in any order
    (Lucene SpanNearQuery(inOrder=false): positions within span
    slop + n - 1). Brute force: anchor every occurrence of any term, test
    the fixed window — the minimal window of a real match starts at a term
    occurrence, so anchoring there is exhaustive."""
    n = len(terms)
    w = slop + n
    tset = set(terms)
    for i, tok in enumerate(tokens):
        if tok in tset and tset <= set(tokens[i : i + w]):
            return True
    return False


def _near_match(tokens: list[str], terms: list[str], slop: int) -> bool:
    """True when ``terms`` appears in order within a window of ``slop``
    extra tokens: positions p_0 < ... < p_{n-1} with p_{n-1} - p_0 <=
    slop + n - 1. Brute force: anchor every occurrence of terms[0], then a
    left-to-right subsequence scan inside the fixed window (greedy
    subsequence matching within a window is exact). slop=0 == contiguous."""
    n = len(terms)
    for i in range(len(tokens) - n + 1):
        if tokens[i] != terms[0]:
            continue
        j, p = 1, i + 1
        end = min(len(tokens), i + n + slop)
        while j < n and p < end:
            if tokens[p] == terms[j]:
                j += 1
            p += 1
        if j == n:
            return True
    return False


def phrase_topk(
    rows: list[tuple[str, object]],
    phrases: list[tuple[int, str]],
    k: int = 10,
    from_html: bool = False,
    slop: int = 0,
    in_order: bool = True,
) -> list[tuple[int, int, str, float]]:
    """Golden phrase top-k: docs whose token sequence contains the phrase
    CONTIGUOUSLY (slop=0) or in order within ``slop`` extra tokens —
    or, with ``in_order=False``, all (distinct) terms inside any
    ``slop + n``-token window in any order — ranked by BM25 over the
    phrase terms (same scoring and tie-break as ``bm25_topk``; phrase
    containment implies every term is present, so this equals
    conjunctive-candidates + window verification)."""
    idx = OracleIndex(rows, from_html=from_html)
    toks: list[list[str]] = []
    for url, payload in sorted(rows, key=lambda r: r[0]):
        text = extract_text(payload) if from_html else payload
        toks.append(tokenize(text))
    out: list[tuple[int, int, str, float]] = []
    for qid, qtext in phrases:
        terms = tokenize(qtext)
        n = len(terms)
        if n == 0:
            continue
        scores = idx.score_all(qtext)
        match = _near_match if in_order else _near_match_unordered
        matched = [
            (d, s)
            for d, s in scores.items()
            if match(toks[d], terms, slop)
        ]
        ranked = sorted(matched, key=lambda kv: (-kv[1], idx.urls[kv[0]]))[:k]
        for rank, (d, s) in enumerate(ranked, start=1):
            out.append((qid, rank, idx.urls[d], s))
    return out


def query_string_topk(
    rows: list[tuple[str, object]],
    queries: list[tuple[int, str]],
    k: int = 10,
    from_html: bool = False,
) -> list[tuple[int, int, str, float]]:
    """Golden ``query_string`` top-k (plans/query.py search_query_string):
    parse each query with the shared lockstep grammar
    (``functions/tokenizer.parse_query_string``), score the union of
    should/must/phrase/prefix-expansion terms as weighted BM25 (weights
    multiply idf; accumulation in sorted unique term order, matching the
    engine's bit-comparable sum contract), then admit a doc iff it contains
    every must term, matches every required phrase contiguously in order,
    and matches no negated term or phrase. Prefix stems expand against the
    corpus vocabulary — the same dictionary the engine's term_stats scan
    mirrors; an expansion colliding with an explicit clause keeps the
    explicit weight."""
    from ..functions.tokenizer import parse_query_string

    idx = OracleIndex(rows, from_html=from_html)
    toks: list[list[str]] = []
    for url, payload in sorted(rows, key=lambda r: r[0]):
        text = extract_text(payload) if from_html else payload
        toks.append(tokenize(text))
    vocab = sorted(idx.postings)
    out: list[tuple[int, int, str, float]] = []
    for qid, qtext in queries:
        p = parse_query_string(qtext)
        weights = dict(p["weights"])
        for stem in p["prefixes"]:
            for term in vocab:
                if term.startswith(stem):
                    weights.setdefault(term, 1.0)
        scores: dict[int, float] = {}
        for term in sorted(weights):
            plist = idx.postings.get(term)
            if not plist:
                continue
            widf = idx.idf(term) * weights[term]
            for did, tf in plist.items():
                dl = idx.doc_len[did]
                denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / idx.avgdl)
                scores[did] = scores.get(did, 0.0) + widf * tf * (
                    BM25_K1 + 1.0
                ) / denom
        for did in list(scores):
            tk = toks[did]
            ok = (
                all(did in idx.postings.get(m, {}) for m in p["must"])
                and all(_near_match(tk, ph, 0) for ph in p["phrases"])
                and not any(did in idx.postings.get(t, {}) for t in p["neg"])
                and not any(_near_match(tk, ph, 0) for ph in p["neg_phrases"])
            )
            if not ok:
                scores.pop(did)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], idx.urls[kv[0]]))[:k]
        for rank, (d, s) in enumerate(ranked, start=1):
            out.append((qid, rank, idx.urls[d], s))
    return out
