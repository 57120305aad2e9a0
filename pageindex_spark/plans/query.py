"""Query plan: BM25 top-k search over the built index.

Physical plan (north_star query path; SURVEY.md §3.3 target mapping):

1. **Pruned scan** — postings read ONLY the term-hash buckets of the query's
   terms (directory/partition pruning) and filter term IN (...) (row-group
   pruning via parquet min/max on the sorted term column).
2. **Slice (map-side, zero decode)** — each run splits into docID-grid cells
   by byte slicing whole blocks (`wand.slice_run_to_cells`).
3. **Cogrouped scoring** — shuffle slices + norms by cell; each cell task
   runs Block-Max WAND (or the dense verifier) per query over its contiguous
   docID range with local norms; emits per-cell top-k.
4. **Global top-k merge** — window rank over (score desc, doc_id asc), tiny
   input (cells x queries x k); then one join to doc_map for urls (runtime-
   filtered by the tiny candidate set).

Queries ship to executors as a broadcast list of (query_id, [(term, idf)]);
idf comes from the pruned term_stats read, so executors never see global
state beyond (n_docs, avgdl).
"""

from __future__ import annotations

import math
import os
import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.tokenizer import (
    BM25_B,
    BM25_K1,
    parse_boost_query,
    parse_query,
    tokenize,
)
from ..operators.compaction import run_from_row
from ..operators.wand import (
    CellNorms,
    assemble_cell_runs,
    bmw_score_cell,
    conjunctive_score_cell,
    dense_score_cell,
    idf_value,
    msm_score_cell,
    slice_run_to_cells,
)
from ..sources.tables import read_index_runs, read_meta
from .build_index import IndexPaths

_SLICE_FIELDS = [
    ("cell", pa.int32()),
    ("term", pa.string()),
    ("first_doc", pa.int64()),
    ("last_doc", pa.int64()),
    ("n_docs", pa.int64()),
    ("doc_blob", pa.binary()),
    ("tf_blob", pa.binary()),
    ("bm_last", pa.list_(pa.int64())),
    ("bm_maxq", pa.list_(pa.float64())),
    ("bm_doc_off", pa.list_(pa.int32())),
    ("bm_tf_off", pa.list_(pa.int32())),
    ("bm_ndocs", pa.list_(pa.int32())),
]
_SLICE_PA = pa.schema([pa.field(n, t) for n, t in _SLICE_FIELDS])
_SLICE_DDL = (
    "cell int, term string, first_doc long, last_doc long, n_docs long, "
    "doc_blob binary, tf_blob binary, bm_last array<long>, bm_maxq array<double>, "
    "bm_doc_off array<int>, bm_tf_off array<int>, bm_ndocs array<int>"
)


# prune_norms auto threshold (VERDICT r4 next #5): below this corpus size
# the norms relation is tiny and the extra sequential metadata job that
# pruning needs costs more wall than the norms shuffle it saves (measured in
# this sandbox); at/above it the norms cogroup side is O(n_docs) bytes per
# query batch and pruning pays for any selective query load. 5M docs ~ a few
# MB of varbyte norms — roughly where the shuffle starts to dominate the
# one extra job. Results are identical either way (pinned by
# test_prune_norms_auto_identity); this only picks the faster plan.
PRUNE_NORMS_AUTO_MIN_DOCS = 5_000_000

# Extra per-cell candidates kept in fixed_point mode. PROBABILISTIC (ADVICE
# r2): per-cell heaps truncate by RAW score, so if more than tie_margin docs
# in one cell share the floored 1e-6 value exactly at the cut, a smaller
# doc_id tie winner can be dropped and ranks diverge from the oracle. 16 is
# far beyond any tie multiplicity observed in the fixtures; raise per-call
# via ``tie_margin=`` when a corpus has pathological score collisions.
FIXED_POINT_TIE_MARGIN = 16


class Searcher:
    """Warm handle over a built index: caches the tiny norms relation and
    the meta, computes term buckets driver-side (Spark-compatible murmur3 in
    Python — no job), and prunes every read to the query's buckets."""

    def __init__(
        self, spark: SparkSession, index_dir: str, cell_parts: int = 4, cache: bool = True
    ):
        self.spark = spark
        self.paths = IndexPaths(index_dir)
        # Finish a crashed expunge swap before reading anything (the
        # journal is the commit point — plans/expunge.py): a reader either
        # sees the pre-journal index or the fully swapped one, never half.
        from .expunge import recover_expunge

        recover_expunge(index_dir)
        self.meta = read_meta(index_dir)
        self.n_docs = int(self.meta["n_docs"])
        self.avgdl = float(self.meta["avgdl"])
        # Block-max validity across expunge-driven avgdl growth: committed
        # bm_maxq bounds were computed at bound_avgdl; inflate by the ratio
        # when the live avgdl grew past it (plans/expunge.py docstring).
        _ba = float(self.meta.get("bound_avgdl", self.avgdl))
        self.bound_scale = max(1.0, self.avgdl / _ba) if _ba > 0 else 1.0
        self.n_buckets = int(self.meta["n_buckets"])
        # Read postings through the storage branch they were written with
        # (ADVICE r2): parquet shim by default, the Iceberg table when the
        # build recorded one.
        self.iceberg_table = (
            self.meta.get("iceberg_table")
            if self.meta.get("storage") == "iceberg"
            else None
        )
        self.grid_parts = np.asarray(self.meta["grid"], dtype=np.int64)
        self.cell_parts = cell_parts
        self.cell_grid = self.grid_parts[::cell_parts].copy()
        # Streamed indexes version postings/norms/term_stats under delta=G
        # dirs; only the deltas recorded in the committed meta are readable
        # (ADVICE r4 medium: a refresh that crashed between its delta write
        # and the meta commit must stay INVISIBLE — its runs hold docIDs
        # beyond the committed grid/norms, so scoring them would read out of
        # bounds). None on batch indexes (no delta partitioning).
        streamed = self.meta.get("streamed") or {}
        self.committed_deltas: list[int] | None = (
            sorted(int(d) for d in streamed["deltas"])
            if "deltas" in streamed
            else None
        )
        # Tombstoned docIDs (plans/deletes.py): materialized driver-side
        # from the COMMITTED version only and masked pre-heap in every
        # scoring kernel. O(deleted) memory — the Lucene delete-bitset
        # trade; the >broadcast-size upgrade path is a (cell -> deleted)
        # side relation through the existing norms cogroup.
        deletes = self.meta.get("deletes") or {}
        self.deleted_ids: np.ndarray | None = None
        if int(deletes.get("n_deleted", 0)) > 0:
            from .deletes import tombstones_dir

            rows = (
                spark.read.parquet(
                    tombstones_dir(index_dir, int(deletes["version"]))
                )
                .select("doc_id")
                .collect()
            )
            self.deleted_ids = np.sort(
                np.asarray([r["doc_id"] for r in rows], dtype=np.int64)
            )
        norms = spark.read.parquet(self.paths.norms)
        if self.committed_deltas is not None:
            norms = norms.filter(
                F.col("delta").isin(self.committed_deltas)
            ).drop("delta")
        self.norms = norms.withColumn(
            "cell", (F.col("part_id") / cell_parts).cast("int")
        )
        if cache:
            # norms is one row per build partition (P rows), but each row
            # carries a varbyte blob of that part's doc lengths, so the
            # relation is O(n_docs) BYTES total (~1-2 B/doc ≈ 1-2 TB at the
            # 10^12-doc target). cache() distributes it across executor
            # storage memory — appropriate on a real cluster sized for the
            # index, and it saves the parquet scan (not the per-query
            # cogroup shuffle, which moves only the cells each query
            # touches). Pass cache=False where executor memory is tight.
            self.norms = self.norms.cache()
        # idf per term, filled lazily from pruned term_stats reads. Sound
        # because a Searcher is pinned to one immutable index version
        # (get_searcher keys on meta.json mtime). Repeat-term queries skip
        # the term_stats job entirely — one fewer sequential Spark job on
        # the latency path (real workloads repeat query terms heavily).
        # Entries are per-queried-term, so the cache stays O(distinct terms
        # asked), never O(vocabulary).
        self._idf_cache: dict[str, float | None] = {}
        # Per-call constants cached per Searcher (r6): the cell-grid
        # broadcast and the empty-result DataFrames were rebuilt on every
        # search() call (~0.1-0.2 s of py4j/broadcast overhead per query in
        # this sandbox). Both are immutable for the life of a Searcher —
        # the grid is pinned to the index version, and an empty DataFrame
        # is just a reusable plan object.
        self._bc_grid = spark.sparkContext.broadcast(self.cell_grid)
        self._empty_cache: dict[str, DataFrame] = {}
        # local-fast-path caches (immutable per Searcher, which is pinned
        # to one index version): norms on-disk size and, once the fast
        # path actually fires (i.e. the index is small by construction),
        # the norms relation as a pandas frame.
        self._norms_disk_bytes: int | None = None
        self._norms_pdf = None

    def _empty_df(self, schema: str) -> DataFrame:
        if schema not in self._empty_cache:
            self._empty_cache[schema] = self.spark.createDataFrame([], schema)
        return self._empty_cache[schema]

    def _local_norms_pdf(self):
        """norms as pandas with the cell column — the driver-side mirror of
        ``self.norms`` (only materialized on the byte-guarded fast path)."""
        if self._norms_pdf is None:
            import pyarrow.parquet as pq

            t = pa.concat_tables(
                pq.read_table(
                    f, columns=["part_id", "first_doc", "n_docs", "dl_blob"]
                )
                for f in _norms_files(self)
            )
            pdf = t.to_pandas()
            pdf["cell"] = (pdf["part_id"] // self.cell_parts).astype("int32")
            self._norms_pdf = pdf
        return self._norms_pdf

    def search(
        self,
        queries: list[tuple[int, str]],
        k: int = 10,
        mode: str = "bmw",
        fixed_point: bool = False,
        with_text: bool = False,
        tie_margin: int = FIXED_POINT_TIE_MARGIN,
        prune_norms: bool | None = None,
        min_match: int = 2,
        offset: int = 0,
        filter_urls: DataFrame | None = None,
        k1: float | None = None,
        b: float | None = None,
        search_after: dict[int, tuple[int, str]] | None = None,
    ) -> DataFrame:
        return _search_impl(
            self, queries, k, mode, fixed_point, with_text, tie_margin,
            prune_norms, min_match, offset, filter_urls, k1, b,
            search_after=search_after,
        )


_SEARCHERS: dict[tuple, Searcher] = {}


def get_searcher(spark: SparkSession, index_dir: str, cell_parts: int = 4) -> Searcher:
    import os as _os

    mtime = _os.path.getmtime(_os.path.join(index_dir, "meta.json"))
    key = (id(spark), index_dir, cell_parts, mtime)
    if key not in _SEARCHERS:
        _SEARCHERS[key] = Searcher(spark, index_dir, cell_parts)
    return _SEARCHERS[key]


def search(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    mode: str = "bmw",
    cell_parts: int = 4,
    fixed_point: bool = False,
    with_text: bool = False,
    prune_norms: bool | None = None,
    min_match: int = 2,
    offset: int = 0,
    filter_urls: DataFrame | None = None,
    k1: float | None = None,
    b: float | None = None,
    search_after: dict[int, tuple[int, str]] | None = None,
) -> DataFrame:
    """Top-k BM25 over the index: -> (query_id, rank, url, score[, text]).

    ``search_after`` is CURSOR paging (Elasticsearch ``search_after`` — the
    scale-correct alternative to ``offset``): per query_id, the
    ``(score6, url)`` sort values of the last row already consumed (score6
    = ``floor(score * 1e6)``, exactly the fixed-point rank key), and the
    next ``k`` results STRICTLY past that cursor in the global
    (score6 desc, url asc) order return with page-relative ranks 1..k.
    Unlike ``offset`` — whose per-cell heaps must deepen to offset+k, so
    page 1000 costs 1000x page 1 — cursor paging keeps every heap at
    k + tie_margin no matter how deep the page: the cursor is an ADMISSION
    predicate evaluated pre-heap in every kernel (BMW scores a pivot, then
    discards it un-offered if it sorts at-or-before the cursor; the dense
    kernels mask scored candidates the same way), the fourth channel of
    the engine-wide pre-heap contract after tombstones, '-term' negations
    and ``filter_urls``. Exactness: admission only removes candidates that
    sort at-or-before the cursor, and every admissible doc still scores
    corpus-wide stats — so page N+1 is exactly what the offset-paged query
    would return at the same depth (pinned by test). Requires
    ``fixed_point=True`` (the cursor is defined over the floored key; a
    raw-float cursor would not survive the engine/oracle boundary) and is
    mutually exclusive with ``offset``. Cursor urls must exist in the
    index (they came from a previous page) — unknown urls raise. Queries
    absent from the dict page from the top (their first page).

    ``k1`` / ``b`` override the BM25 similarity parameters for THIS query
    batch only (Lucene per-field similarity config / Elasticsearch
    ``similarity`` settings; defaults k1=1.2, b=0.75 are the index-wide
    constants every committed byte was built with). Overrides touch no
    committed bytes: the exhaustive kernels simply evaluate the formula at
    (k1, b), and BMW stays exact because the build-time block-max bounds
    inflate by the provable parameter factor (_param_bound_scale — looser
    pruning, identical results). Requires k1 > 0 and 0 <= b <= 1 (the
    proof's domain); b=0 (length normalization off) is served via the
    score <= idf*(k1+1) cap instead of a finite factor.

    ``filter_urls`` (a DataFrame with a ``url`` column) runs the whole
    batch as a FILTERED search — Lucene filter-context / Elasticsearch
    ``filter`` clause semantics: only documents in the set may rank, but
    the filter never touches scoring (df/avgdl/n_docs stay corpus-wide, so
    a doc that passes scores identically to the unfiltered query — the
    filter is a predicate, not a signal). The set resolves to docIDs with
    ONE column-pruned broadcast-joined scan of the extracts and masks
    candidates PRE-HEAP through the same exclusion contract as tombstones
    and '-term' negations; cells containing no filtered doc are skipped
    before any postings decode. The resolved set is O(filter) driver
    memory — right for selective attribute filters (language, domain
    whitelists, date slices); a filter near corpus size should instead be
    expunged into its own index, or shipped as a (cell -> allowed) side
    relation through the norms cogroup (same upgrade path as the
    tombstone note in plans/deletes.py).

    ``offset`` pages past the first results (ranks offset+1..offset+k,
    absolute ranks preserved): per-cell heaps deepen to offset+k so page N
    is exactly what an offset-0 search would place there — the classic
    deep-paging cost model (Elasticsearch from/size), so keep offsets
    shallow and prefer larger k for exports.

    ``mode`` picks the matching semantics: ``"bmw"`` (default, Block-Max
    WAND OR), ``"dense"`` (exhaustive OR verifier), ``"conjunctive"`` (AND),
    or ``"msm"`` — minimum_should_match: docs matching at least
    ``min_match`` of the query's terms rank (Lucene ``minimumShouldMatch``;
    clamped to the query's term count, so one-term queries behave like OR
    and ``min_match >= n_terms`` like AND).

    ``fixed_point`` ranks over ``floor(score * 1e6)`` with doc_id tie-break
    (the CLAUDE.md invariant for cross-engine determinism — the DuckDB
    oracle ranks over the floored value); cells are asked for a small tie
    margin beyond k so docs straddling a 1e-6 cell never flip the cut.
    ``with_text`` also fetches the winners' extracted text (reference
    retrieval parity: /root/reference/pageindex/utils.py:554-564 returns
    node text, not just ids) — same pruned partition read, one extra column.

    ``prune_norms`` (the 100-TB switch): the scoring cogroup otherwise
    shuffles the ENTIRE norms relation — O(n_docs) bytes, terabytes at the
    10^12-doc target — for every query batch, even when the query terms'
    postings touch a handful of cells. With the flag on, one extra
    metadata-only job reads the pruned runs' (first_doc, last_doc) ranges
    (column-pruned: blobs never load), the driver maps them to build
    partitions via the docID grid, and the norms side of the cogroup is
    filtered to exactly those partitions before it shuffles. Results are
    identical (pinned by test); default off because in THIS sandbox the
    extra sequential job costs more wall than the tiny norms shuffle saves
    — on a real cluster flip it on for any selective query load.
    """
    return get_searcher(spark, index_dir, cell_parts).search(
        queries, k, mode, fixed_point, with_text, prune_norms=prune_norms,
        min_match=min_match, offset=offset, filter_urls=filter_urls,
        k1=k1, b=b, search_after=search_after,
    )


def _adjacency_expr(
    tokens_col: str, terms: list[str], slop: int = 0, in_order: bool = True
):
    """JVM predicate: ``terms`` appears as an ORDERED subsequence of the
    token array within a window of ``slop`` extra tokens (slop=0 ==
    contiguous; the SpanNearQuery(inOrder=true) shape — a match is
    positions p_0 < ... < p_{n-1} with p_{n-1} - p_0 <= slop + n - 1).
    Codegen'd ``exists`` over positions, nested one level per term for
    slop > 0 (each level scans at most slop+1 candidate slots, so cost is
    O(len * (slop+1)^(n-1)) worst case — fine for human-sized queries); no
    Python UDF either way. Spark ``sequence(lo, hi)`` is DESCENDING when
    lo > hi, so every level guards its range explicitly.

    ``in_order=False`` is the SpanNearQuery(inOrder=false) shape: every
    (DISTINCT — callers enforce) term inside SOME ``slop + n``-token
    window, any order. Anchoring windows at occurrences of any term is
    exhaustive (a real match's minimal window starts at one), and distinct
    terms occupy distinct slots automatically; one ``exists`` per term
    over the fixed window, all codegen, window hi >= lo always."""
    n = len(terms)
    sz0 = f"size({tokens_col})"
    if not in_order:
        w = slop + n  # window length in tokens
        anchor = " or ".join(f"{tokens_col}[i0] = '{t}'" for t in terms)
        has = " and ".join(
            f"exists(sequence(i0, least(i0 + {w - 1}, {sz0} - 1)), "
            f"j{j} -> {tokens_col}[j{j}] = '{t}')"
            for j, t in enumerate(terms)
        )
        return F.expr(
            f"case when {sz0} >= {n} then "
            f"exists(sequence(0, {sz0} - 1), i0 -> ({anchor}) and {has}) "
            f"else false end"
        )
    if slop == 0:
        conds = " and ".join(
            f"{tokens_col}[i + {j}] = '{t}'" for j, t in enumerate(terms)
        )
        return F.expr(
            f"case when size({tokens_col}) >= {n} then "
            f"exists(sequence(0, size({tokens_col}) - {n}), i -> {conds}) "
            f"else false end"
        )
    sz = f"size({tokens_col})"

    def level(j: int) -> str:
        if j == n:
            return "true"
        # i{j} in (i{j-1}, min(i0 + slop + j, last slot leaving room for
        # the n-1-j terms still to place)]
        lo = f"i{j - 1} + 1"
        hi = f"least(i0 + {slop + j}, {sz} - {n - j})"
        inner = f"{tokens_col}[i{j}] = '{terms[j]}' and {level(j + 1)}"
        return (
            f"(case when {lo} <= {hi} then "
            f"exists(sequence({lo}, {hi}), i{j} -> {inner}) else false end)"
        )

    body = f"{tokens_col}[i0] = '{terms[0]}' and {level(1)}"
    return F.expr(
        f"case when {sz} >= {n} then "
        f"exists(sequence(0, {sz} - {n}), i0 -> {body}) else false end"
    )


def search_phrase(
    spark: SparkSession,
    index_dir: str,
    phrases: list[tuple[int, str]],
    k: int = 10,
    cand_cap: int = 1000,
    cell_parts: int = 4,
    fixed_point: bool = False,
    with_text: bool = False,
    prune_norms: bool | None = None,
    use_positions: bool | None = None,
    slop: int = 0,
    in_order: bool = True,
) -> DataFrame:
    """Top-k phrase search: docs where the phrase's tokens appear
    CONTIGUOUSLY (``slop=0``) or as an ORDERED subsequence within ``slop``
    extra tokens (Lucene SpanNearQuery(inOrder=true) / sloppy-phrase
    shape: a match is positions p_0 < ... < p_{n-1} with
    p_{n-1} - p_0 <= slop + n - 1), ranked by BM25 over the phrase terms
    -> (query_id, rank, url, score[, text]). Both verification paths
    accept any slop: the text path widens its codegen'd window predicate,
    the sidecar path runs a vectorized greedy chain (for each start
    position the minimal increasing chain is pointwise minimal, so
    checking its span is exact).

    ``in_order=False`` relaxes to SpanNearQuery(inOrder=false): every
    term inside SOME ``slop + n``-token window, ANY order. Unordered
    queries require DISTINCT terms (raised otherwise — with duplicates
    the distinct-slot requirement stops being automatic and both
    verification paths would need multiset matching; Lucene's own
    unordered spans are subtle there for the same reason).

    The index stores no positions (bag-of-words postings), so phrase
    matching is the classic two-stage plan: (1) CONJUNCTIVE candidates
    from the committed index — same pruned postings scan and cell cogroup
    as BM25, but the cell scorer intersects the phrase terms' postings
    (``conjunctive_score_cell``; exact per cell since cells partition
    docID space) — then (2) adjacency VERIFICATION on the candidates'
    text, distributed and codegen'd (tokenize + ``exists`` over
    positions, no Python). A term the index has never seen drops out of
    stage 1, widening candidates to a superset; stage 2 is the exact
    final filter either way. Results are exact whenever a query's
    conjunctive candidate count <= ``cand_cap`` (always, for phrases
    with at least one non-stopword term); an all-stopword phrase may
    truncate recall at the cap — raise ``cand_cap`` for those, or build
    the POSITIONS SIDECAR (``plans/positions.py``): when a current
    sidecar is committed (``use_positions=None`` auto-detects; True
    forces, False opts out), phrases run exact at any scale with no
    candidate cap and no text fetch, identical results where both paths
    are exact.
    """
    from ..functions.sqlglue import spark_terms
    from .positions import phrase_search_positions, sidecar_ready

    if slop < 0:
        raise ValueError(f"slop must be >= 0, got {slop}")
    if not in_order:
        for qid, text in phrases:
            ts = tokenize(text)
            if len(set(ts)) != len(ts):
                raise ValueError(
                    f"in_order=False requires distinct terms; query {qid} "
                    f"repeats a term: {ts}"
                )
    se = get_searcher(spark, index_dir, cell_parts)
    if use_positions is None:
        use_positions = sidecar_ready(se.meta, index_dir)
    if use_positions:
        return phrase_search_positions(
            se, phrases, k=k, fixed_point=fixed_point, with_text=with_text,
            slop=slop, in_order=in_order,
        )

    cand = get_searcher(spark, index_dir, cell_parts).search(
        phrases,
        k=cand_cap,
        mode="conjunctive",
        fixed_point=fixed_point,
        with_text=True,
        prune_norms=prune_norms,
    )
    qterms = {qid: tokenize(text) for qid, text in phrases}
    toks = F.expr(spark_terms("text"))
    cond = F.lit(False)
    for qid, terms in qterms.items():
        if terms:
            cond = F.when(
                F.col("query_id") == qid,
                _adjacency_expr("tk", terms, slop, in_order),
            ).otherwise(cond)
    matched = (
        cand.withColumn("tk", toks)
        .filter(cond)
        .drop("tk", "rank")
    )
    order_key = (
        F.floor(F.col("score") * 1_000_000).cast("long")
        if fixed_point
        else F.col("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc(order_key), F.asc("url"))
    out_cols = ["query_id", "rank", "url", "score"] + (
        ["text"] if with_text else []
    )
    return (
        matched.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*out_cols)
    )


def search_phrase_prefix(
    spark: SparkSession,
    index_dir: str,
    phrases: list[tuple[int, str, str]],
    k: int = 10,
    cand_cap: int = 1000,
    cell_parts: int = 4,
    fixed_point: bool = False,
) -> DataFrame:
    """Phrase-prefix search (Elasticsearch ``match_phrase_prefix`` — the
    search-as-you-type query): docs where the full terms appear
    CONTIGUOUSLY followed immediately by a token STARTING WITH the
    prefix -> (query_id, rank, url, score). ``phrases`` rows are
    (query_id, full_terms_text, prefix) — the user has finished typing
    ``full_terms_text`` and is mid-word on ``prefix``. Requires at least
    one full term (a bare prefix is ``search_prefix``'s job; raised).
    Ranked by BM25 over the FULL terms only — the half-typed word has no
    stable statistics, matching Lucene's practice of scoring the phrase
    terms and treating the expansion as a filter.

    Plan: conjunctive candidates on the full terms (stage 1 of
    ``search_phrase`` — same pruned postings scan + cell cogroup), then
    a codegen'd verification predicate over the candidates' text:
    ``exists`` over positions anchoring the full-term run with a
    ``substr`` prefix test on the next slot. NO expansion cap: ES
    truncates the prefix to ``max_expansions`` dictionary terms and can
    MISS matches; verifying against the candidate text is exact at any
    vocabulary size and never enumerates the dictionary. The trade is
    stage 1's conjunctive-candidates exactness bound (cand_cap, same as
    ``search_phrase``'s documented contract); the positions sidecar is
    the same scale-up. Exclusion contract applies pre-heap in stage 1."""
    from ..functions.sqlglue import spark_terms

    se = get_searcher(spark, index_dir, cell_parts)
    qinfo: dict[int, tuple[list[str], str]] = {}
    for qid, text, prefix in phrases:
        terms = tokenize(text)
        pfx = "".join(tokenize(prefix))
        if not terms:
            raise ValueError(
                f"query {qid}: match_phrase_prefix needs >= 1 full term "
                "(use search_prefix for a bare prefix)"
            )
        if not pfx:
            raise ValueError(f"query {qid}: empty prefix")
        qinfo[qid] = (terms, pfx)
    cand = se.search(
        [(qid, " ".join(ts)) for qid, (ts, _p) in qinfo.items()],
        k=cand_cap,
        mode="conjunctive",
        fixed_point=fixed_point,
        with_text=True,
    )
    toks = F.expr(spark_terms("text"))
    cond = F.lit(False)
    for qid, (terms, pfx) in qinfo.items():
        n = len(terms) + 1
        run = " and ".join(
            f"tk[i + {j}] = '{t}'" for j, t in enumerate(terms)
        )
        pred = (
            f"case when size(tk) >= {n} then "
            f"exists(sequence(0, size(tk) - {n}), i -> {run} and "
            f"substr(tk[i + {n - 1}], 1, {len(pfx)}) = '{pfx}') "
            f"else false end"
        )
        cond = F.when(F.col("query_id") == qid, F.expr(pred)).otherwise(cond)
    matched = cand.withColumn("tk", toks).filter(cond).drop("tk", "rank")
    order_key = (
        F.floor(F.col("score") * 1_000_000).cast("long")
        if fixed_point
        else F.col("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc(order_key), F.asc("url"))
    return (
        matched.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "url", "score")
    )


def search_span_first(
    spark: SparkSession,
    index_dir: str,
    spans: list[tuple[int, str, int]],
    k: int = 10,
    cand_cap: int = 1000,
    cell_parts: int = 4,
    fixed_point: bool = False,
) -> DataFrame:
    """Span-first search (Lucene ``SpanFirstQuery`` / ES ``span_first``):
    docs where the term occurs within the FIRST ``end`` token positions —
    "mentioned in the lede", the classic title/lead-paragraph proxy when
    the index is single-field -> (query_id, rank, url, score). ``spans``
    rows are (query_id, term_text, end) with ``end`` counted 1-based
    inclusive (a match at position p requires p <= end, Lucene's span end
    boundary); ``term_text`` must tokenize to exactly ONE term — wrapping
    multi-term spans composes through ``search_phrase``'s machinery and is
    out of scope here, matching the single-term SpanTermQuery that
    span_first wraps in practice. Ranked by BM25 over the term (position
    never changes tf — a filter, not a boost), so scores are comparable
    with the unconstrained query's.

    Plan: stage 1 pulls candidates containing the term through the standard
    pruned-postings search (``cand_cap`` exactness bound, the documented
    ``search_phrase`` contract), then a codegen'd verification over the
    candidates' text: ``array_contains`` on the head ``slice`` of the token
    array. The bag-of-words index stores no positions, so position tests
    verify against text — same trade as ``search_phrase_prefix``; the
    positions sidecar (plans/positions.py) is the committed-artifact
    scale-up when lede queries dominate a workload. Exclusion contract
    (tombstones, deletes) applies pre-heap in stage 1."""
    from ..functions.sqlglue import spark_terms

    se = get_searcher(spark, index_dir, cell_parts)
    qinfo: dict[int, tuple[str, int]] = {}
    for qid, text, end in spans:
        terms = tokenize(text)
        if len(terms) != 1:
            raise ValueError(
                f"query {qid}: span_first wraps exactly one term, got "
                f"{terms!r} (compose multi-term spans via search_phrase)"
            )
        if end < 1:
            raise ValueError(f"query {qid}: end must be >= 1, got {end}")
        qinfo[qid] = (terms[0], end)
    cand = se.search(
        [(qid, t) for qid, (t, _e) in qinfo.items()],
        k=cand_cap,
        mode="conjunctive",
        fixed_point=fixed_point,
        with_text=True,
    )
    toks = F.expr(spark_terms("text"))
    cond = F.lit(False)
    for qid, (term, end) in qinfo.items():
        pred = f"array_contains(slice(tk, 1, {end}), '{term}')"
        cond = F.when(F.col("query_id") == qid, F.expr(pred)).otherwise(cond)
    matched = cand.withColumn("tk", toks).filter(cond).drop("tk", "rank")
    order_key = (
        F.floor(F.col("score") * 1_000_000).cast("long")
        if fixed_point
        else F.col("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc(order_key), F.asc("url"))
    return (
        matched.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "url", "score")
    )


def search_span_not(
    spark: SparkSession,
    index_dir: str,
    spans: list[tuple[int, str, str, int]],
    k: int = 10,
    cand_cap: int = 1000,
    cell_parts: int = 4,
    fixed_point: bool = False,
) -> DataFrame:
    """Span-not search (Lucene ``SpanNotQuery`` / ES ``span_not``): docs
    where the INCLUDE term occurs at least once with NO occurrence of the
    EXCLUDE term within ``w`` token positions — "data, but not the 'data
    spark' collocation" -> (query_id, rank, url, score). ``spans`` rows
    are (query_id, include_text, exclude_text, w); both texts must
    tokenize to exactly ONE term each (multi-term spans compose through
    ``search_phrase``'s machinery, the ``search_span_first`` convention).
    Ranked by BM25 over the include term — the span test is a FILTER, not
    a boost (scores comparable with the unconstrained query; the same
    deliberate deviation from Lucene's surviving-span sloppy-freq that
    ``span_first`` documents).

    Plan: stage 1 pulls candidates containing the include term through the
    standard pruned-postings search (``cand_cap`` exactness bound, the
    ``search_phrase`` contract); stage 2 is a codegen'd positional verify
    over the candidates' text — EXISTS over include positions whose
    +-``w`` token window contains no exclude occurrence (nested
    higher-order ``exists``, no Python). The bag-of-words index stores no
    positions, so position tests verify against text — the positions
    sidecar (plans/positions.py) is the committed-artifact scale-up.
    Exclusion contract (tombstones, deletes, '-term') applies pre-heap in
    stage 1 as always."""
    from ..functions.sqlglue import spark_terms

    se = get_searcher(spark, index_dir, cell_parts)
    qinfo: dict[int, tuple[str, str, int]] = {}
    for qid, inc_text, exc_text, w in spans:
        inc, exc = tokenize(inc_text), tokenize(exc_text)
        if len(inc) != 1 or len(exc) != 1:
            raise ValueError(
                f"query {qid}: span_not wraps exactly one include and one "
                f"exclude term, got {inc!r} / {exc!r}"
            )
        if w < 1:
            raise ValueError(f"query {qid}: w must be >= 1, got {w}")
        if inc[0] == exc[0]:
            raise ValueError(
                f"query {qid}: include and exclude terms must differ"
            )
        qinfo[qid] = (inc[0], exc[0], w)
    cand = se.search(
        [(qid, a) for qid, (a, _b, _w) in qinfo.items()],
        k=cand_cap,
        mode="conjunctive",
        fixed_point=fixed_point,
        with_text=True,
    )
    toks = F.expr(spark_terms("text"))
    cond = F.lit(False)
    for qid, (a, b, w) in qinfo.items():
        pred = (
            f"exists(sequence(0, size(tk) - 1), i -> tk[i] = '{a}' and not "
            f"exists(sequence(greatest(0, i - {w}), "
            f"least(i + {w}, size(tk) - 1)), j -> tk[j] = '{b}'))"
        )
        cond = F.when(F.col("query_id") == qid, F.expr(pred)).otherwise(cond)
    matched = cand.withColumn("tk", toks).filter(cond).drop("tk", "rank")
    order_key = (
        F.floor(F.col("score") * 1_000_000).cast("long")
        if fixed_point
        else F.col("score")
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc(order_key), F.asc("url")
    )
    return (
        matched.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "url", "score")
    )


def search_intervals(
    spark: SparkSession,
    index_dir: str,
    chains: list[tuple[int, str, int]],
    k: int = 10,
    cand_cap: int = 1000,
    cell_parts: int = 4,
    fixed_point: bool = False,
) -> DataFrame:
    """Intervals search (ES ``intervals`` query, ``match`` rule with
    ``ordered: true`` and ``max_gaps``): docs where the query's terms
    appear as an ORDERED chain p_1 < ... < p_m spending at most ``g``
    TOTAL gap positions (p_m - p_1 - (m-1) <= g — the budget is shared
    across the chain, unlike ``search_phrase``'s per-window slop) ->
    (query_id, rank, url, score). ``chains`` rows are (query_id, text, g);
    ``text`` must tokenize to >= 2 DISTINCT terms (conjunctive stage-1
    scoring sums each term once; a repeated term would double-count).
    Ranked by BM25 over the chain's terms — a chain match contains all of
    them, so scores equal the conjunctive query's.

    Plan: stage 1 pulls conjunctive candidates from the committed index
    (same pruned postings scan as BM25; ``cand_cap`` exactness bound, the
    ``search_phrase`` contract), stage 2 verifies the chain with nested
    codegen'd ``exists`` over token positions — the window for term r is
    (p_{r-1}+1 .. p_1 + r + g): later gaps are >= 0, so every prefix must
    stay inside the budget, and the telescoped total-gap constraint needs
    no greedy/DP search, just existential nesting. The bag-of-words index
    stores no positions, so verification reads candidate text — the
    positions sidecar (plans/positions.py) is the committed-artifact
    scale-up. Exclusion contract applies pre-heap in stage 1 as always."""
    from ..functions.sqlglue import spark_terms

    se = get_searcher(spark, index_dir, cell_parts)
    qinfo: dict[int, tuple[list[str], int]] = {}
    for qid, text, g in chains:
        terms = tokenize(text)
        if len(terms) < 2:
            raise ValueError(
                f"query {qid}: intervals needs >= 2 terms, got {terms!r}"
            )
        if len(set(terms)) != len(terms):
            raise ValueError(
                f"query {qid}: intervals terms must be distinct, got {terms!r}"
            )
        if g < 0:
            raise ValueError(f"query {qid}: max_gaps must be >= 0, got {g}")
        qinfo[qid] = (terms, g)
    cand = se.search(
        [(qid, " ".join(ts)) for qid, (ts, _g) in qinfo.items()],
        k=cand_cap,
        mode="conjunctive",
        fixed_point=fixed_point,
        with_text=True,
    )

    def _nest(terms: list[str], g: int, r: int) -> str:
        # window for term r (0-based): lo = i{r-1}+1, hi = i0 + r + g
        hi = f"least(i0 + {r} + {g}, size(tk) - 1)"
        lo = f"i{r - 1} + 1"
        inner = (
            f" and {_nest(terms, g, r + 1)}" if r + 1 < len(terms) else ""
        )
        return (
            f"(case when {lo} <= {hi} then exists(sequence({lo}, {hi}), "
            f"i{r} -> tk[i{r}] = '{terms[r]}'{inner}) else false end)"
        )

    toks = F.expr(spark_terms("text"))
    cond = F.lit(False)
    for qid, (terms, g) in qinfo.items():
        pred = (
            f"case when size(tk) >= {len(terms)} then "
            f"exists(sequence(0, size(tk) - 1), "
            f"i0 -> tk[i0] = '{terms[0]}' and {_nest(terms, g, 1)}) "
            "else false end"
        )
        cond = F.when(F.col("query_id") == qid, F.expr(pred)).otherwise(cond)
    matched = cand.withColumn("tk", toks).filter(cond).drop("tk", "rank")
    order_key = (
        F.floor(F.col("score") * 1_000_000).cast("long")
        if fixed_point
        else F.col("score")
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc(order_key), F.asc("url")
    )
    return (
        matched.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "url", "score")
    )


def search_multi_field(
    spark: SparkSession,
    fields: list[tuple[str, float]],
    queries: list[tuple[int, str]],
    k: int = 10,
    tie_breaker: float = 0.0,
    cell_parts: int = 4,
) -> DataFrame:
    """Multi-field retrieval (Elasticsearch ``multi_match`` with
    ``best_fields``, the default type): the same query scored against
    SEVERAL per-field indexes — e.g. title^2 and body — combined per doc
    as ``best + tie_breaker * (sum - best)`` over the per-field boosted
    BM25 scores -> (query_id, rank, url, final6, best6). ``fields`` rows
    are (index_dir, boost); each field is its own committed index over
    the SAME url space (this engine's analogue of Lucene's per-field
    inverted lists — every field keeps its OWN df/avgdl statistics, which
    is exactly what makes best_fields beat naive field concatenation).
    A doc matching in only one field still ranks (per-field OR semantics
    survive the combination). tie_breaker=0 is pure dis_max across
    fields; 1 sums the fields.

    Plan: ONE exhaustive raw-score kernel per field (the standard pruned
    scan — fields run independently, so a 100-TB body index and a 100-GB
    title index each prune to their own touched cells), each field's
    (query, doc) scores joined to its OWN extracts for the url key
    (grids may differ across indexes — url is the cross-field identity,
    the engine's standing docID==url-order invariant), boosted, then one
    UNION + map-side-combined groupBy(query, url) for max/sum. Ranking
    is two-phase over a url-hash bucket (per-bucket top-k, global rank
    over survivors — never a global sort; the part grids differ across
    fields so the hash bucket replaces part_id as the skew shield).
    Pick boosts and tie_breaker exactly representable (0.25, 0.5, 2.0):
    the combination is then two IEEE ops both engines round identically
    (per-doc per-field addends are commutative at 2 fields; beyond ~3
    fields sub-1e-6 sum-order wobble can flip floor ties).
    Exclusion contract applies pre-heap inside each field's kernel."""
    if not fields:
        raise ValueError("multi_match needs >= 1 field")
    if not 0.0 <= tie_breaker <= 1.0:
        raise ValueError(f"tie_breaker must be in [0, 1], got {tie_breaker}")
    for idx, boost in fields:
        if boost <= 0:
            raise ValueError(f"field {idx}: boost must be > 0, got {boost}")
    per_field: list[DataFrame] = []
    for index_dir, boost in fields:
        se = get_searcher(spark, index_dir, cell_parts)
        scored, parts = _search_impl(
            se, queries, k, "dense", fixed_point=True, raw_scored=True
        )
        ext = spark.read.parquet(se.paths.docs_extracted).select(
            F.col("part_id").cast("int").alias("part_id"), "local_pos", "url"
        )
        if parts is not None and 2 * len(parts) < len(se.grid_parts):
            ext = ext.filter(F.col("part_id").isin(sorted(parts)))
        per_field.append(
            scored.join(ext, ["part_id", "local_pos"]).select(
                "query_id",
                "url",
                (F.col("score") * F.lit(float(boost))).alias("s"),
            )
        )
    unioned = per_field[0]
    for df in per_field[1:]:
        unioned = unioned.unionByName(df)
    agg = (
        unioned.groupBy("query_id", "url")
        .agg(F.max("s").alias("mx"), F.sum("s").alias("sm"))
        .withColumn(
            "final6",
            F.floor(
                (
                    F.col("mx")
                    + F.lit(float(tie_breaker)) * (F.col("sm") - F.col("mx"))
                )
                * 1_000_000
            ).cast("long"),
        )
        .withColumn("best6", F.floor(F.col("mx") * 1_000_000).cast("long"))
    )
    order = (F.desc("final6"), F.asc("url"))
    w_bkt = Window.partitionBy(
        "query_id", F.pmod(F.crc32(F.col("url")), F.lit(32))
    ).orderBy(*order)
    w_all = Window.partitionBy("query_id").orderBy(*order)
    return (
        agg.withColumn("pr", F.row_number().over(w_bkt))
        .filter(F.col("pr") <= k)
        .withColumn("rank", F.row_number().over(w_all))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "url", "final6", "best6")
    )


def _expand_prefixes(
    se: Searcher, stems: list[str], max_expansions: int
) -> dict[str, list[str]]:
    """One term-dictionary scan expanding every prefix stem to its concrete
    index terms. The scan cannot bucket-prune (buckets hash whole terms) but
    it is column-pruned to ``term`` and ships a pushed StringStartsWith per
    stem to parquet (row-group pruning via min/max; terms sort within files)
    — a metadata-class read, never postings blobs. Raises when a stem
    matches more than ``max_expansions`` terms: silent truncation would make
    results depend on scan order."""
    ts = se.spark.read.parquet(se.paths.term_stats)
    if se.committed_deltas is not None:
        # streamed: the latest committed delta holds the full recompute.
        ts = ts.filter(F.col("delta") == max(se.committed_deltas))
    cond = F.col("term").startswith(stems[0])
    for s in stems[1:]:
        cond = cond | F.col("term").startswith(s)
    terms = [
        r["term"] for r in ts.filter(cond).select("term").distinct().collect()
    ]
    out: dict[str, list[str]] = {}
    for s in stems:
        exp = sorted(t for t in terms if t.startswith(s))
        if len(exp) > max_expansions:
            raise ValueError(
                f"prefix '{s}*' expands to {len(exp)} terms "
                f"(> max_expansions={max_expansions})"
            )
        out[s] = exp
    return out


def search_prefix(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    mode: str = "bmw",
    cell_parts: int = 4,
    fixed_point: bool = False,
    with_text: bool = False,
    prune_norms: bool | None = None,
    max_expansions: int = 1000,
) -> DataFrame:
    """Top-k BM25 with 'term*' PREFIX wildcards: each trailing-'*' word
    expands against the term dictionary to every index term with that
    prefix, then the query runs as ordinary OR retrieval over the union of
    literal + expansion terms (Lucene's scoring-BooleanQuery rewrite: BM25
    is a per-distinct-term sum, so driver-side expansion is EXACTLY
    equivalent — each expansion scores with its own idf). Everything
    downstream reuses the standard plan: expansions are concrete terms, so
    bucket pruning, BMW, '-term' negation, deletes and fixed_point all work
    unchanged. A stem matching nothing contributes no terms (a query left
    with no terms at all returns no rows)."""
    from ..functions.tokenizer import parse_prefix_query

    se = get_searcher(spark, index_dir, cell_parts)
    parsed = {qid: parse_prefix_query(text) for qid, text in queries}
    stems = sorted({s for _, ss in parsed.values() for s in ss})
    exp = _expand_prefixes(se, stems, max_expansions) if stems else {}
    expanded = []
    for qid, (lits, ss) in parsed.items():
        words = list(lits)
        for s in ss:
            words.extend(exp.get(s, []))
        if words:
            expanded.append((qid, " ".join(words)))
    if not expanded:
        out_schema = "query_id int, rank int, url string, score double" + (
            ", text string" if with_text else ""
        )
        return spark.createDataFrame([], out_schema)
    return se.search(
        expanded, k=k, mode=mode, fixed_point=fixed_point,
        with_text=with_text, prune_norms=prune_norms,
    )


def suggest_terms(
    spark: SparkSession,
    index_dir: str,
    prefixes: list[tuple[int, str]],
    k: int = 10,
    cell_parts: int = 4,
) -> DataFrame:
    """Autocomplete / term suggestion (the Lucene ``TermsEnum``-prefix /
    Elasticsearch ``completion``-lite surface): for each ``(query_id,
    prefix)``, the top-``k`` index terms starting with the prefix, ranked
    by document frequency desc with term-asc tie-break ->
    (query_id, rank, term, df).

    Plan shape: ONE term-dictionary scan, column-pruned to (term, df) with
    every prefix's StringStartsWith pushed to parquet (row-group pruning —
    terms sort within files; bucket dirs can't prune, buckets hash whole
    terms), then a broadcast join against the tiny prefix relation and a
    per-query window rank. Everything stays JVM-side; shuffled rows are
    O(matching vocabulary), never postings. Streamed indexes pin the scan
    to the committed max delta (the full recompute). A prefix matching
    nothing yields no rows for its query_id."""
    se = get_searcher(spark, index_dir, cell_parts)
    ts = spark.read.parquet(se.paths.term_stats)
    if se.committed_deltas is not None:
        ts = ts.filter(F.col("delta") == max(se.committed_deltas))
    stems = sorted({p for _, p in prefixes})
    if not stems:
        return spark.createDataFrame(
            [], "query_id int, rank int, term string, df long"
        )
    cond = F.col("term").startswith(stems[0])
    for s in stems[1:]:
        cond = cond | F.col("term").startswith(s)
    pfx = spark.createDataFrame(prefixes, "query_id int, prefix string")
    w = Window.partitionBy("query_id").orderBy(F.desc("df"), F.asc("term"))
    return (
        ts.filter(cond)
        .select("term", F.col("df").cast("long").alias("df"))
        .join(F.broadcast(pfx), F.col("term").startswith(F.col("prefix")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "term", "df")
    )


def search_fuzzy(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    max_edits: int = 1,
    mode: str = "bmw",
    cell_parts: int = 4,
    fixed_point: bool = False,
    with_text: bool = False,
    max_expansions: int = 1000,
) -> DataFrame:
    """Top-k BM25 with FUZZY terms (Lucene FuzzyQuery shape): every query
    token expands to the index terms within ``max_edits`` Levenshtein edits
    (itself included when present), then the query runs as ordinary OR/BMW
    retrieval over the expansion union — the same scoring-rewrite as
    ``search_prefix``, each expansion scoring with its own idf. (Lucene
    additionally down-weights by similarity; this engine keeps pure BM25 so
    the DuckDB twin is exact — both engines ship the same ``levenshtein``.)

    The expansion scan is a FULL pass over the term dictionary (edit
    distance can't push to parquet min/max) but stays column-pruned to
    ``term`` and JVM-side (``F.levenshtein`` in codegen) — a metadata-class
    read. At trillion-term vocabularies, swap in a deletion-neighborhood or
    trigram sidecar keyed like the positions sidecar; the plan downstream
    is unchanged either way. A token expanding to more than
    ``max_expansions`` terms raises (never silent truncation)."""
    se = get_searcher(spark, index_dir, cell_parts)
    # '-term' negations pass through UNexpanded (Lucene doesn't fuzz
    # exclusions either; silently dropping the '-' would flip an exclusion
    # into a positive fuzzy match). Only positive tokens expand.
    split = {qid: parse_query(text) for qid, text in queries}
    toks = {qid: tokenize(pos) for qid, (pos, _negs) in split.items()}
    negs = {qid: ns for qid, (_pos, ns) in split.items() if ns}
    uniq = sorted({t for ts in toks.values() for t in ts})
    if not uniq:
        out_schema = "query_id int, rank int, url string, score double" + (
            ", text string" if with_text else ""
        )
        return spark.createDataFrame([], out_schema)
    ts = spark.read.parquet(se.paths.term_stats)
    if se.committed_deltas is not None:
        ts = ts.filter(F.col("delta") == max(se.committed_deltas))
    cond = F.levenshtein(F.col("term"), F.lit(uniq[0])) <= max_edits
    for t in uniq[1:]:
        cond = cond | (F.levenshtein(F.col("term"), F.lit(t)) <= max_edits)
    vocab = [r["term"] for r in ts.filter(cond).select("term").distinct().collect()]

    def _ed(a: str, b: str) -> int:
        # classic DP; tokens are short and vocab is pre-filtered by the scan
        if abs(len(a) - len(b)) > max_edits:
            return max_edits + 1
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    expanded = []
    for qid, qts in toks.items():
        words: list[str] = []
        for t in qts:
            exp = sorted(v for v in vocab if _ed(v, t) <= max_edits)
            if len(exp) > max_expansions:
                raise ValueError(
                    f"fuzzy term {t!r} expands to {len(exp)} terms "
                    f"(> max_expansions={max_expansions})"
                )
            words.extend(exp)
        if words:
            words.extend(f"-{n}" for n in negs.get(qid, ()))
            expanded.append((qid, " ".join(words)))
    if not expanded:
        out_schema = "query_id int, rank int, url string, score double" + (
            ", text string" if with_text else ""
        )
        return spark.createDataFrame([], out_schema)
    return se.search(
        expanded, k=k, mode=mode, fixed_point=fixed_point, with_text=with_text
    )


def suggest_spelling(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str]],
    s: int = 3,
    max_edits: int = 1,
    cell_parts: int = 4,
) -> DataFrame:
    """Did-you-mean / spelling correction (Elasticsearch ``term`` suggester
    with ``suggest_mode=missing``; Lucene ``DirectSpellChecker``): for each
    query, every positive token ABSENT from the index vocabulary gets its
    top-``s`` candidate corrections — vocabulary terms within ``max_edits``
    Levenshtein edits — ranked by (edit distance asc, df desc, term asc),
    Lucene's comparator exactly -> (query_id, token, rank, suggestion,
    dist, df). Tokens the index knows are never "corrected" (the
    ``missing`` mode contract — autocomplete is ``suggest_terms``, fixing
    what matched is not this surface's job); '-term' negations are skipped
    like ``search_fuzzy`` skips them. A token with no candidate inside the
    edit budget yields no rows.

    Plan shape: the exact-membership probe rides the Searcher's
    bucket-pruned idf cache (``_ensure_idf`` — the dictionary scan
    filters to the tokens' hash buckets, a handful of parquet files);
    only the candidate pass is a full ``levenshtein`` dictionary scan
    like ``search_fuzzy`` (column-pruned to (term, df), streamed indexes
    pinned to the committed max delta; edit distance can't push to
    parquet min/max — a deletion-neighborhood or trigram sidecar is the
    trillion-term swap, plan unchanged). Candidates join the tiny
    (query, token) relation BROADCAST; ranking is one window over
    O(tokens x candidates) rows — never postings, never norms."""
    from ..functions.tokenizer import parse_query, tokenize

    se = get_searcher(spark, index_dir, cell_parts)
    tok_rows: list[tuple[int, str]] = []
    for qid, text in queries:
        pos, _negs = parse_query(text)
        for t in sorted(set(tokenize(pos))):
            tok_rows.append((qid, t))
    empty = spark.createDataFrame(
        [],
        "query_id int, token string, rank int, suggestion string, "
        "dist int, df long",
    )
    if not tok_rows:
        return empty
    uniq = sorted({t for _qid, t in tok_rows})
    # Membership via the Searcher's bucket-pruned idf cache (_ensure_idf
    # filters the dictionary scan to the tokens' hash buckets — a handful
    # of parquet files), not a bespoke full-dictionary isin scan.
    _ensure_idf(se, uniq)
    known = {t for t in uniq if se._idf_cache[t] is not None}
    missing = [(qid, t) for qid, t in tok_rows if t not in known]
    if not missing:
        return empty
    muniq = sorted({t for _qid, t in missing})
    ts = spark.read.parquet(se.paths.term_stats)
    if se.committed_deltas is not None:
        ts = ts.filter(F.col("delta") == max(se.committed_deltas))
    cond = F.levenshtein(F.col("term"), F.lit(muniq[0])) <= max_edits
    for t in muniq[1:]:
        cond = cond | (F.levenshtein(F.col("term"), F.lit(t)) <= max_edits)
    cand = ts.filter(cond).select(
        "term", F.col("df").cast("long").alias("df")
    )
    toks = spark.createDataFrame(missing, "query_id int, token string")
    dist = F.levenshtein(F.col("term"), F.col("token"))
    w = Window.partitionBy("query_id", "token").orderBy(
        F.asc("dist"), F.desc("df"), F.asc("term")
    )
    return (
        cand.join(F.broadcast(toks), dist <= max_edits)
        .withColumn("dist", dist.cast("int"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= s)
        .select(
            "query_id",
            "token",
            "rank",
            F.col("term").alias("suggestion"),
            "dist",
            "df",
        )
    )


def search_wildcard(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    mode: str = "bmw",
    cell_parts: int = 4,
    fixed_point: bool = False,
    with_text: bool = False,
    max_expansions: int = 1000,
) -> DataFrame:
    """Top-k BM25 with GENERAL wildcards (Lucene ``WildcardQuery`` shape):
    words containing '*' (any run) or '?' (exactly one char) ANYWHERE —
    'w*w', 's?a*', '?uery' — expand against the term dictionary, then the
    query runs as ordinary OR/BMW retrieval over the literal+expansion
    union (the same scoring-BooleanQuery rewrite as ``search_prefix`` /
    ``search_fuzzy``: BM25 is a per-distinct-term sum, so driver-side
    expansion is exactly equivalent, each expansion scoring with its own
    idf; bucket pruning / negation / deletes / fixed_point all compose
    unchanged on the concrete terms).

    Expansion plan: ONE column-pruned term-dictionary scan. Every
    pattern's regex (``wildcard_regex`` — shared with the SQL twin, so
    both engines match the identical term set) evaluates JVM-side via
    ``rlike``; patterns with a literal head additionally push their
    ``wildcard_prefix`` as StringStartsWith to parquet (row-group pruning
    — terms sort within files), so 'cust*er' reads like a prefix query
    and only leading-wildcard patterns pay the full dictionary pass. A
    pattern matching more than ``max_expansions`` terms raises (silent
    truncation would make results scan-order-dependent); a pattern
    matching nothing contributes no terms. Reference parity: the
    reference has no query language at all (retrieval is an LLM prompt,
    /root/reference/README.md:179-188); this is the standard IR surface
    over the same corpus."""
    import re as _re

    from ..functions.tokenizer import (
        parse_wildcard_query,
        wildcard_prefix,
        wildcard_regex,
    )

    se = get_searcher(spark, index_dir, cell_parts)
    parsed = {qid: parse_wildcard_query(text) for qid, text in queries}
    pats = sorted({p for _, ps in parsed.values() for p in ps})
    exp: dict[str, list[str]] = {}
    if pats:
        ts = spark.read.parquet(se.paths.term_stats)
        if se.committed_deltas is not None:
            ts = ts.filter(F.col("delta") == max(se.committed_deltas))
        cond = F.col("term").rlike(wildcard_regex(pats[0]))
        for p in pats[1:]:
            cond = cond | F.col("term").rlike(wildcard_regex(p))
        heads = [wildcard_prefix(p) for p in pats]
        if all(heads):
            # every pattern has a literal head -> the scan is prefix-pushed
            # exactly like search_prefix (the rlike then verifies).
            pcond = F.col("term").startswith(heads[0])
            for h in heads[1:]:
                pcond = pcond | F.col("term").startswith(h)
            cond = pcond & cond
        vocab = [
            r["term"] for r in ts.filter(cond).select("term").distinct().collect()
        ]
        for p in pats:
            rx = _re.compile(wildcard_regex(p))
            m = sorted(t for t in vocab if rx.match(t))
            if len(m) > max_expansions:
                raise ValueError(
                    f"wildcard {p!r} expands to {len(m)} terms "
                    f"(> max_expansions={max_expansions})"
                )
            exp[p] = m
    expanded = []
    for qid, (lits, ps) in parsed.items():
        words = list(lits)
        for p in ps:
            words.extend(exp.get(p, []))
        if words:
            expanded.append((qid, " ".join(words)))
    if not expanded:
        out_schema = "query_id int, rank int, url string, score double" + (
            ", text string" if with_text else ""
        )
        return spark.createDataFrame([], out_schema)
    return se.search(
        expanded, k=k, mode=mode, fixed_point=fixed_point, with_text=with_text
    )


def search_regexp(
    spark: SparkSession,
    index_dir: str,
    patterns: list[tuple[int, str]],
    k: int = 10,
    mode: str = "bmw",
    cell_parts: int = 4,
    fixed_point: bool = False,
    with_text: bool = False,
    max_expansions: int = 1000,
) -> DataFrame:
    """Top-k BM25 for REGEXP term queries (Elasticsearch ``regexp`` query /
    Lucene ``RegexpQuery``): each (query_id, pattern) matches the ENTIRE
    term (implicit anchoring, the ES contract — 'cust.*' matches customer,
    never locust), the matching vocabulary expands into an OR query, and
    retrieval runs as the standard scoring-BooleanQuery rewrite (the
    ``search_prefix``/``search_wildcard``/``search_fuzzy`` shape: BM25 is
    a per-distinct-term sum, so driver-side expansion is exactly
    equivalent, each expansion scoring with its own idf; pruning /
    deletes / fixed_point compose unchanged on the concrete terms).

    Expansion plan: ONE column-pruned term-dictionary scan, every pattern
    evaluated JVM-side as ``rlike('^(?:pat)$')`` (anchors supply the
    full-match contract). Patterns use Java regex here and RE2-family
    engines in twins/oracles — the engine-portable subset (literals,
    char classes, '.', '*', '+', '?', '{m,n}', alternation, grouping) is
    the documented domain, the same subset the ES regexp query guarantees;
    backrefs/lookarounds are Java-only and out of contract. A pattern
    expanding past ``max_expansions`` raises (silent truncation would be
    scan-order-dependent); one matching nothing contributes no terms, and
    a query with no surviving terms returns no rows. At trillion-term
    vocabularies the dictionary pass swaps to an n-gram sidecar that
    prefilters candidate terms by the pattern's literal n-grams (Lucene's
    own RegexpQuery acceleration), plan downstream unchanged."""
    import re as _re

    se = get_searcher(spark, index_dir, cell_parts)
    pats = sorted({p for _qid, p in patterns})
    exp: dict[str, list[str]] = {}
    if pats:
        ts = spark.read.parquet(se.paths.term_stats)
        if se.committed_deltas is not None:
            ts = ts.filter(F.col("delta") == max(se.committed_deltas))
        cond = F.col("term").rlike(f"^(?:{pats[0]})$")
        for p in pats[1:]:
            cond = cond | F.col("term").rlike(f"^(?:{p})$")
        vocab = [
            r["term"] for r in ts.filter(cond).select("term").distinct().collect()
        ]
        for p in pats:
            rx = _re.compile(f"(?:{p})")
            m = sorted(t for t in vocab if rx.fullmatch(t))
            if len(m) > max_expansions:
                raise ValueError(
                    f"regexp {p!r} expands to {len(m)} terms "
                    f"(> max_expansions={max_expansions})"
                )
            exp[p] = m
    # Multiple patterns under one query_id OR together (ES bool-should of
    # regexp queries) — expansions union per qid, deduped, so a repeated
    # qid never produces duplicate result rows.
    by_qid: dict[int, list[str]] = {}
    for qid, p in patterns:
        by_qid.setdefault(qid, []).append(p)
    expanded = []
    for qid, ps in sorted(by_qid.items()):
        words = sorted({t for p in ps for t in exp.get(p, [])})
        if words:
            expanded.append((qid, " ".join(words)))
    if not expanded:
        out_schema = "query_id int, rank int, url string, score double" + (
            ", text string" if with_text else ""
        )
        return spark.createDataFrame([], out_schema)
    return se.search(
        expanded, k=k, mode=mode, fixed_point=fixed_point, with_text=with_text
    )


def search_synonyms(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str]],
    synonyms: dict[str, list[str]],
    k: int = 10,
    mode: str = "bmw",
    cell_parts: int = 4,
    fixed_point: bool = False,
    with_text: bool = False,
) -> DataFrame:
    """Top-k BM25 with QUERY-TIME synonym expansion (Lucene
    SynonymGraphFilter on the search analyzer / Elasticsearch query-time
    ``synonym`` filter): each positive token expands to itself plus its
    mapped synonyms via the shared lockstep ``expand_synonyms`` (one hop,
    no transitivity; '-term' negations stay literal; non-token mapping
    entries raise), then the query runs as ordinary OR/BMW retrieval over
    the union — the same scoring-BooleanQuery rewrite as
    prefix/fuzzy/wildcard: each expansion scores with its OWN idf
    (Lucene's ``expand=true``; SynonymQuery's blended-df mode is the
    documented alternative — deliberately not chosen so the rewrite stays
    a plain OR the oracle can mirror), so bucket pruning / negation /
    deletes / fixed_point compose unchanged on the concrete terms.

    Query-time expansion (vs index-time) is the web-scale default: the
    mapping can change without touching a committed byte, and the cost is
    a few extra terms through the same pruned-scan plan. The mapping is
    driver-side data (broadcast-class at any realistic thesaurus size);
    an index-time variant would be one extra tokenize stage in the build.
    Reference parity: the reference has no query language at all
    (/root/reference/README.md:179-188)."""
    from ..functions.tokenizer import expand_synonyms

    expanded = [(qid, expand_synonyms(text, synonyms)) for qid, text in queries]
    return get_searcher(spark, index_dir, cell_parts).search(
        expanded, k=k, mode=mode, fixed_point=fixed_point, with_text=with_text
    )


def rescore_phrase(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    window: int = 30,
    bonus: float = 0.5,
    slop: int = 0,
    cell_parts: int = 4,
) -> DataFrame:
    """Rescore window (Elasticsearch ``rescore`` with a query rescorer /
    the classic two-stage retrieve-then-rerank): the top-``window`` BM25
    results per query re-rank by ``score + bonus`` for docs where the
    query's tokens appear as a contiguous phrase (``slop`` widens to the
    ordered near-window) -> (query_id, rank, url, rescore6, score).
    Fixed-point throughout: rescore6 = floor(score*1e6) +
    (phrase ? floor(bonus*1e6) : 0), ranked (rescore6 desc, url asc == the
    docID tie-break) — exact and oracle-mirrorable.

    ES semantics exactly: rescoring never RECALLS — a doc outside the
    base top-``window`` cannot enter the final top-k even if it contains
    the phrase (the trade that makes rescore cheap; raise ``window`` to
    push the recall boundary). Plan shape: the base search is the
    ordinary BMW plan at k=window (full exclusion contract), the phrase
    test runs on the <= queries x window winner texts the lookup already
    fetched — the codegen'd ``_adjacency_expr`` predicate, zero extra
    jobs, zero norms re-reads — and the re-rank is a window over
    <= queries x window rows. ``window < k`` raises."""
    from ..functions.sqlglue import spark_terms

    if window < k:
        raise ValueError(f"window ({window}) must be >= k ({k})")
    se = get_searcher(spark, index_dir, cell_parts)
    base = se.search(queries, k=window, fixed_point=True, with_text=True)
    qterms = {qid: tokenize(text) for qid, text in queries}
    toks = F.expr(spark_terms("text"))
    cond = F.lit(False)
    for qid, terms in qterms.items():
        if terms:
            cond = F.when(
                F.col("query_id") == qid,
                _adjacency_expr("tk", terms, slop, True),
            ).otherwise(cond)
    bonus6 = int(math.floor(bonus * 1_000_000))
    s6 = F.floor(F.col("score") * 1_000_000).cast("long")
    resc = (
        base.withColumn("tk", toks)
        .withColumn(
            "rescore6",
            s6 + F.when(cond, F.lit(bonus6)).otherwise(F.lit(0)).cast("long"),
        )
        .drop("tk", "text", "rank")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rescore6"), F.asc("url")
    )
    return (
        resc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "url", "rescore6", "score")
    )


def search_collapse(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str]],
    collapse_keys: DataFrame,
    k: int = 10,
    cell_parts: int = 4,
    fixed_point: bool = False,
) -> DataFrame:
    """Field collapsing (Elasticsearch ``collapse`` / Lucene result
    grouping): the top-``k`` matching docs per query where at most ONE doc
    per collapse key ranks — each key is represented by its best doc under
    the engine ranking order -> (query_id, rank, url, ckey, score). The
    classic web-search "one result per site" dedup. ``collapse_keys`` is a
    (url, ckey) dimension DataFrame; docs absent from it drop (same
    missing-value convention as ``search_sorted_by`` — callers wanting
    ES's keep-missing behavior supply a defaulted dimension, e.g. ckey =
    url).

    Exactness needs the best doc of EVERY key that matched, which only the
    full scored match set contains (a per-cell top-k could hide a key's
    global best behind same-cell docs of other keys), so matching runs the
    exhaustive dense kernel with no per-cell truncate — O(matches) scored
    rows, the inherent ES-collapse cost class, same as facets /
    sort-by-field (BMW's top-k contract cannot serve collapse). The full
    exclusion contract applies pre-heap as always (tombstones, '-term',
    ``filter_urls`` via ``search``'s machinery). Plan shape after the
    kernel, all JVM-side:

    1. url join: ONE extracts scan column-pruned to (part_id, local_pos,
       url) and filtered to the partitions the pruned runs can touch (the
       prune list ``raw_scored`` computes driver-side), joined on the
       kernel-emitted coordinates; then the ckey dimension joins on url.
    2. collapse: ``groupBy(query_id, ckey).agg(max(struct(...)))`` — an
       argmax by (score6 desc, docID asc) encoded as a lexicographic
       struct max, so Spark runs it as ONE shuffle with map-side partial
       aggregation (a window would shuffle the same rows without the
       combine).
    3. rank: never global-sorts — per-(query, hash-of-ckey mod 64) top-k
       first, then a global rank over <= queries x 64 x k survivors (the
       ``search_sorted_by`` two-phase shape).

    ``fixed_point`` collapses and ranks over floor(score*1e6) with docID
    tie-break (the oracle-exact order); raw doubles otherwise. Ties break
    url-asc == docID order, the engine-wide tie-break."""
    se = get_searcher(spark, index_dir, cell_parts)
    scored, parts = _search_impl(
        se, queries, k, "dense", fixed_point, raw_scored=True
    )
    ext = spark.read.parquet(se.paths.docs_extracted).select(
        F.col("part_id").cast("int").alias("part_id"), "local_pos", "url"
    )
    if parts is not None and 2 * len(parts) < len(se.grid_parts):
        ext = ext.filter(F.col("part_id").isin(sorted(parts)))
    skey = (
        F.floor(F.col("score") * 1_000_000).cast("long")
        if fixed_point
        else F.col("score")
    )
    keyed = (
        scored.join(ext, ["part_id", "local_pos"])
        .join(collapse_keys.select("url", "ckey"), "url")
        .withColumn("skey", skey)
    )
    best = (
        keyed.groupBy("query_id", "ckey")
        .agg(
            F.max(
                F.struct(
                    F.col("skey"),
                    (-F.col("doc_id")).alias("ndoc"),
                    F.col("doc_id"),
                    F.col("url"),
                    F.col("score"),
                )
            ).alias("b")
        )
        .select(
            "query_id",
            "ckey",
            F.col("b.skey").alias("skey"),
            F.col("b.doc_id").alias("doc_id"),
            F.col("b.url").alias("url"),
            F.col("b.score").alias("score"),
        )
    )
    order = (F.desc("skey"), F.asc("doc_id"))
    w_part = Window.partitionBy(
        "query_id", F.pmod(F.hash("ckey"), F.lit(64))
    ).orderBy(*order)
    w_all = Window.partitionBy("query_id").orderBy(*order)
    return (
        best.withColumn("pr", F.row_number().over(w_part))
        .filter(F.col("pr") <= k)
        .withColumn("rank", F.row_number().over(w_all))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "url", "ckey", "score")
    )


def search_collapse_inner(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str]],
    collapse_keys: DataFrame,
    k: int = 5,
    inner_k: int = 3,
    cell_parts: int = 4,
    fixed_point: bool = False,
) -> DataFrame:
    """Field collapsing WITH inner hits (Elasticsearch
    ``collapse.inner_hits``): the top-``k`` collapse GROUPS per query —
    groups ranked by their best doc under the engine order — each
    returning its own top-``inner_k`` member docs -> (query_id, rank,
    ckey, inner_rank, url, score). The "one result per site, expandable"
    SERP shape: rank is the group's position, inner_rank 1..inner_k the
    docs within it (inner_rank 1 IS the doc plain ``search_collapse``
    would return).

    Same exactness argument as ``search_collapse`` (a per-cell top-k could
    hide a group's global best), so matching runs the exhaustive dense
    kernel — O(matches) scored rows. Plan shape:

    1. url + ckey join as in ``search_collapse`` (pruned extracts scan).
    2. group ranking: the argmax-per-key struct max (ONE map-side-combined
       shuffle), then the two-phase rank (per-(query, hash(ckey) mod 64)
       top-k, global rank over <= queries x 64 x k survivors) — never a
       global sort.
    3. inner hits: row_number per (query_id, ckey) keeps each group's top
       ``inner_k``; the surviving groups (<= queries x k rows after the
       rank filter) BROADCAST-join onto them, so the only wide exchange
       on the O(matches) side is the window's own (query, ckey) shuffle.

    The group-rank lineage and the inner-hits window both read the kernel
    output (the ``significant_terms`` re-run-over-persist convention).
    ``fixed_point`` ranks groups AND members over floor(score*1e6) with
    docID tie-break — the oracle-exact order."""
    if k < 1 or inner_k < 1:
        raise ValueError(f"k and inner_k must be >= 1, got k={k}, inner_k={inner_k}")
    se = get_searcher(spark, index_dir, cell_parts)
    scored, parts = _search_impl(
        se, queries, k, "dense", fixed_point, raw_scored=True
    )
    ext = spark.read.parquet(se.paths.docs_extracted).select(
        F.col("part_id").cast("int").alias("part_id"), "local_pos", "url"
    )
    if parts is not None and 2 * len(parts) < len(se.grid_parts):
        ext = ext.filter(F.col("part_id").isin(sorted(parts)))
    skey = (
        F.floor(F.col("score") * 1_000_000).cast("long")
        if fixed_point
        else F.col("score")
    )
    keyed = (
        scored.join(ext, ["part_id", "local_pos"])
        .join(collapse_keys.select("url", "ckey"), "url")
        .withColumn("skey", skey)
    )
    order = (F.desc("skey"), F.asc("doc_id"))
    best = (
        keyed.groupBy("query_id", "ckey")
        .agg(
            F.max(
                F.struct(F.col("skey"), (-F.col("doc_id")).alias("ndoc"))
            ).alias("b")
        )
        .select(
            "query_id",
            "ckey",
            F.col("b.skey").alias("skey"),
            (-F.col("b.ndoc")).cast("long").alias("doc_id"),
        )
    )
    w_part = Window.partitionBy(
        "query_id", F.pmod(F.hash("ckey"), F.lit(64))
    ).orderBy(*order)
    w_all = Window.partitionBy("query_id").orderBy(*order)
    groups = (
        best.withColumn("pr", F.row_number().over(w_part))
        .filter(F.col("pr") <= k)
        .withColumn("rank", F.row_number().over(w_all))
        .filter(F.col("rank") <= k)
        .select("query_id", "ckey", "rank")
    )
    w_inner = Window.partitionBy("query_id", "ckey").orderBy(*order)
    inner = keyed.withColumn("inner_rank", F.row_number().over(w_inner)).filter(
        F.col("inner_rank") <= inner_k
    )
    return inner.join(F.broadcast(groups), ["query_id", "ckey"]).select(
        "query_id", "rank", "ckey", "inner_rank", "url", "score"
    )


def search_function_score(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str]],
    factors: DataFrame,
    k: int = 10,
    cell_parts: int = 4,
) -> DataFrame:
    """Function scoring (Elasticsearch ``function_score`` with
    ``field_value_factor``, boost_mode=multiply): top-k matching docs per
    query ranked by ``BM25 x factor``, where ``factors`` is a (url,
    factor) dimension — the standard popularity / recency / PageRank-style
    boost of web ranking -> (query_id, rank, url, factor, final6, score).
    ``final6 = floor(score * factor * 1e6)`` — one IEEE double product
    both engines round identically, so the fixed-point order is
    oracle-exact; ties break url-asc (docID order). Docs absent from the
    dimension drop (the ``search_sorted_by`` missing-value convention;
    supply a defaulted dimension for ES's ``missing:`` behavior).

    A multiplicative factor REORDERS globally (a low-BM25 doc with a huge
    factor may beat everything), so a top-k heap under BM25 order cannot
    serve it exactly — matching runs the exhaustive dense kernel via
    ``raw_scored`` (O(matches) scored rows, the same inherent cost class
    as collapse; ES pays it too unless users settle for the
    rescore-window approximation, which this engine also offers). The
    upgrade path when the factor is BOUNDED is documented: with
    max(factor) known, BMW block bounds scale by it and the heap stays
    exact — a one-line bound_scale change, not taken here because the
    generic dimension is unbounded. After the kernel: pruned extracts
    url-join, broadcast-class dimension join, two-phase rank
    (per-(query, part) top-k, then global — never a global sort)."""
    se = get_searcher(spark, index_dir, cell_parts)
    scored, parts = _search_impl(
        se, queries, k, "dense", fixed_point=True, raw_scored=True
    )
    ext = spark.read.parquet(se.paths.docs_extracted).select(
        F.col("part_id").cast("int").alias("part_id"), "local_pos", "url"
    )
    if parts is not None and 2 * len(parts) < len(se.grid_parts):
        ext = ext.filter(F.col("part_id").isin(sorted(parts)))
    keyed = (
        scored.join(ext, ["part_id", "local_pos"])
        .join(factors.select("url", "factor"), "url")
        .withColumn(
            "final6",
            F.floor(F.col("score") * F.col("factor") * 1_000_000).cast("long"),
        )
    )
    order = (F.desc("final6"), F.asc("doc_id"))
    w_part = Window.partitionBy("query_id", "part_id").orderBy(*order)
    w_all = Window.partitionBy("query_id").orderBy(*order)
    return (
        keyed.withColumn("pr", F.row_number().over(w_part))
        .filter(F.col("pr") <= k)
        .withColumn("rank", F.row_number().over(w_all))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "url", "factor", "final6", "score")
    )


def search_rank_feature(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str]],
    features: DataFrame,
    pivot: float,
    weight: float,
    k: int = 10,
    cell_parts: int = 4,
) -> DataFrame:
    """The ES ``rank_feature`` query (default saturation function) as a
    bool SHOULD clause: top-k matching docs per query ranked by
    ``BM25 + weight * f / (f + pivot)`` -> (query_id, rank, url, final6,
    score6). ``features`` is a (url, f) dimension; docs MISSING the
    feature still rank, contributing 0 (LEFT join + coalesce — the ES
    contract, unlike ``search_function_score``'s multiplicative drop).
    The saturation is bounded in [0, 1), so the additive boost is bounded
    by ``weight`` — the documented exact-BMW upgrade (inflate bounds by
    ``+weight``) applies when this query dominates a workload; here the
    exhaustive dense kernel keeps the generic case exact (an additive
    bounded boost can still promote a doc from below any per-cell top-k).
    Float ops in pinned order (one division, one multiply, one add, one
    floor) — identical to the ``rank_feature`` SQL twin."""
    se = get_searcher(spark, index_dir, cell_parts)
    scored, parts = _search_impl(
        se, queries, k, "dense", fixed_point=True, raw_scored=True
    )
    ext = spark.read.parquet(se.paths.docs_extracted).select(
        F.col("part_id").cast("int").alias("part_id"), "local_pos", "url"
    )
    if parts is not None and 2 * len(parts) < len(se.grid_parts):
        ext = ext.filter(F.col("part_id").isin(sorted(parts)))
    fd = F.col("f").cast("double")
    sat = F.coalesce(fd / (fd + F.lit(pivot)), F.lit(0.0))
    keyed = (
        scored.join(ext, ["part_id", "local_pos"])
        .join(features.select("url", "f"), "url", "left")
        .withColumn(
            "final6",
            F.floor(
                (F.col("score") + F.lit(weight) * sat) * 1_000_000
            ).cast("long"),
        )
        .withColumn(
            "score6", F.floor(F.col("score") * 1_000_000).cast("long")
        )
    )
    order = (F.desc("final6"), F.asc("url"))
    w_part = Window.partitionBy("query_id", "part_id").orderBy(*order)
    w_all = Window.partitionBy("query_id").orderBy(*order)
    return (
        keyed.withColumn("pr", F.row_number().over(w_part))
        .filter(F.col("pr") <= k)
        .withColumn("rank", F.row_number().over(w_all))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "url", "final6", "score6")
    )


_DIS_MAX_WIDTH = 64  # max distinct terms per dis_max query (id encoding)


def search_dis_max(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    tie_breaker: float = 0.5,
    cell_parts: int = 4,
) -> DataFrame:
    """Disjunction-max retrieval (Elasticsearch / Lucene ``dis_max`` over
    per-term queries, the ``best_fields`` combination): top-k matching
    docs per query ranked by ``best + tie_breaker * (sum - best)`` where
    ``best``/``sum`` are the max and total of the doc's single-term BM25
    scores -> (query_id, rank, url, final6, best6). At tie_breaker=0 a
    doc scores only its best term (pure dis_max); at 1 it degrades to the
    ordinary OR sum. The classic use: queries whose terms are synonyms-ish
    (one strong term match should beat scattered weak ones). ``queries``
    are plain OR term lists — operator syntax has no meaning when each
    term is its own subquery.

    Plan: each query decomposes into single-term subqueries encoded as
    ``qid * 64 + i`` through ONE ``raw_scored`` exhaustive kernel call —
    the pruned postings scan dedups terms across subqueries, and since
    the subqueries are disjoint singletons the total decode work equals
    the plain OR query's. The per-doc max/sum then ride one map-side-
    combined groupBy (same shuffle class as the kernel's own cell
    cogroup), the factor math is two JVM ops, and ranking is the
    ``search_function_score`` two-phase shape (per-(query, part) top-k,
    then a global rank over the survivors — never a global sort). The
    max is order-free; the sum is the same partial-sum class as every
    scored twin. Exclusion contract (tombstones, filter) applies pre-heap
    inside the kernel per subquery, identical to ``search``.

    Pick ``tie_breaker`` exactly representable (0, 0.25, 0.5, 1) and the
    combination is a fused multiply-add both engines round identically.
    Reference parity: /root/reference has no ranked retrieval at all (LLM
    prompt selection); this is the Lucene DisjunctionMaxQuery analogue on
    this engine's kernel."""
    if not 0.0 <= tie_breaker <= 1.0:
        raise ValueError(f"tie_breaker must be in [0, 1], got {tie_breaker}")
    se = get_searcher(spark, index_dir, cell_parts)
    sub: list[tuple[int, str]] = []
    for qid, text in queries:
        terms = sorted(set(tokenize(text)))
        if len(terms) > _DIS_MAX_WIDTH:
            raise ValueError(
                f"query {qid} has {len(terms)} terms > {_DIS_MAX_WIDTH}"
            )
        sub.extend((qid * _DIS_MAX_WIDTH + i, t) for i, t in enumerate(terms))
    empty = spark.createDataFrame(
        [], "query_id int, rank int, url string, final6 long, best6 long"
    )
    if not sub:
        return empty
    scored, parts = _search_impl(
        se, sub, k, "dense", fixed_point=True, raw_scored=True
    )
    agg = (
        scored.withColumn(
            "query_id",
            F.expr(f"query_id div {_DIS_MAX_WIDTH}").cast("int"),
        )
        .groupBy("query_id", "doc_id", "part_id", "local_pos")
        .agg(F.max("score").alias("mx"), F.sum("score").alias("sm"))
        .withColumn(
            "final6",
            F.floor(
                (
                    F.col("mx")
                    + F.lit(float(tie_breaker))
                    * (F.col("sm") - F.col("mx"))
                )
                * 1_000_000
            ).cast("long"),
        )
        .withColumn(
            "best6", F.floor(F.col("mx") * 1_000_000).cast("long")
        )
    )
    ext = spark.read.parquet(se.paths.docs_extracted).select(
        F.col("part_id").cast("int").alias("part_id"), "local_pos", "url"
    )
    if parts is not None and 2 * len(parts) < len(se.grid_parts):
        ext = ext.filter(F.col("part_id").isin(sorted(parts)))
    keyed = agg.join(ext, ["part_id", "local_pos"])
    order = (F.desc("final6"), F.asc("doc_id"))
    w_part = Window.partitionBy("query_id", "part_id").orderBy(*order)
    w_all = Window.partitionBy("query_id").orderBy(*order)
    return (
        keyed.withColumn("pr", F.row_number().over(w_part))
        .filter(F.col("pr") <= k)
        .withColumn("rank", F.row_number().over(w_all))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "url", "final6", "best6")
    )


def search_boosting(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str, str]],
    k: int = 10,
    negative_boost: float = 0.5,
    cell_parts: int = 4,
) -> DataFrame:
    """Boosting query (Elasticsearch ``boosting``): top-k docs per query
    ranked by the POSITIVE query's BM25 score, demoted — not excluded —
    by ``negative_boost`` when the doc ALSO matches the negative query ->
    (query_id, rank, url, final6, demoted). The soft cousin of '-term'
    exclusion: "prefer docs not about X" instead of "never show X".
    ``queries`` rows are (query_id, positive_text, negative_text); the
    negative side is a plain OR match (membership, never scored into the
    result). final6 = floor(score * factor * 1e6) with url-asc (docID)
    ties; pick ``negative_boost`` exactly representable (0.25, 0.5) and
    the product rounds identically across engines.

    Plan: positive and negative ride ONE ``raw_scored`` exhaustive kernel
    call as even/odd-encoded subqueries (``qid*2`` positive, ``qid*2+1``
    negative) — one pruned postings scan, one cell cogroup. The negative
    rows collapse to a distinct (query, doc) membership set and LEFT-join
    the positive scored set (membership is per-partition-local — both
    sides carry the kernel's (part_id, local_pos) coordinates, so AQE
    sees co-partitioned children); demotion is a ``when`` in JVM codegen,
    then the ``search_function_score`` two-phase rank. A demoting factor
    reorders globally, hence the exhaustive kernel (same inherent cost
    class as function_score; a BMW heap cannot serve it exactly). The
    negative kernel wastes its score arithmetic on a membership question
    — a doc-only match kernel would shave it; noted, not material until
    negative queries dominate a workload (the scan + decode dominate
    either way). Exclusion contract (tombstones, '-term' inside either
    text) applies pre-heap inside the kernel per subquery, as always."""
    if not 0.0 <= negative_boost <= 1.0:
        raise ValueError(
            f"negative_boost must be in [0, 1], got {negative_boost}"
        )
    se = get_searcher(spark, index_dir, cell_parts)
    sub: list[tuple[int, str]] = []
    for qid, pos_text, neg_text in queries:
        sub.append((qid * 2, pos_text))
        if neg_text and tokenize(neg_text):
            sub.append((qid * 2 + 1, neg_text))
    empty = spark.createDataFrame(
        [], "query_id int, rank int, url string, final6 long, demoted int"
    )
    if not sub:
        return empty
    scored, parts = _search_impl(
        se, sub, k, "dense", fixed_point=True, raw_scored=True
    )
    half = F.expr("query_id div 2").cast("int")
    pos = scored.filter(F.pmod("query_id", F.lit(2)) == 0).withColumn(
        "query_id", half
    )
    neg = (
        scored.filter(F.pmod("query_id", F.lit(2)) == 1)
        .select(half.alias("query_id"), "doc_id")
        .distinct()
        .withColumn("neg", F.lit(1))
    )
    boosted = (
        pos.join(neg, ["query_id", "doc_id"], "left")
        .withColumn(
            "factor",
            F.when(F.col("neg").isNotNull(), F.lit(float(negative_boost)))
            .otherwise(F.lit(1.0)),
        )
        .withColumn(
            "final6",
            F.floor(F.col("score") * F.col("factor") * 1_000_000).cast(
                "long"
            ),
        )
        .withColumn(
            "demoted", F.col("neg").isNotNull().cast("int")
        )
    )
    ext = spark.read.parquet(se.paths.docs_extracted).select(
        F.col("part_id").cast("int").alias("part_id"), "local_pos", "url"
    )
    if parts is not None and 2 * len(parts) < len(se.grid_parts):
        ext = ext.filter(F.col("part_id").isin(sorted(parts)))
    keyed = boosted.join(ext, ["part_id", "local_pos"])
    order = (F.desc("final6"), F.asc("doc_id"))
    w_part = Window.partitionBy("query_id", "part_id").orderBy(*order)
    w_all = Window.partitionBy("query_id").orderBy(*order)
    return (
        keyed.withColumn("pr", F.row_number().over(w_part))
        .filter(F.col("pr") <= k)
        .withColumn("rank", F.row_number().over(w_all))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "url", "final6", "demoted")
    )


def search_terms_set(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str]],
    required: DataFrame,
    k: int = 10,
    cell_parts: int = 4,
) -> DataFrame:
    """Terms-set query (Elasticsearch ``terms_set`` with
    ``minimum_should_match_field``): top-k docs per query where the
    number of DISTINCT query terms the doc contains meets a PER-DOC
    threshold from the ``required`` (url, required) dimension ->
    (query_id, rank, url, score6, n_matched, req). The dynamic cousin of
    static ``minimum_should_match``: strict docs (high required) demand
    full coverage, lenient docs admit partial matches. Docs absent from
    the dimension drop (the engine-wide missing-value convention; supply
    a defaulted dimension for keep-missing). Ranked by the full OR BM25
    sum over floored score6 with url-asc (docID) ties.

    Plan: the ``search_dis_max`` decomposition — single-term subqueries
    encoded ``qid*64+i`` through ONE ``raw_scored`` exhaustive kernel
    call (one pruned postings scan; disjoint singleton subqueries keep
    total decode work equal to the plain OR query's). Per-doc matched
    count and score sum ride one map-side-combined groupBy; the required
    join happens AFTER the url lookup (both dimension joins are
    broadcast-class); the threshold filter is one codegen'd comparison;
    then the standard two-phase rank. The static-msm kernel can't serve
    this (its threshold is per-query, applied pre-heap); the per-doc
    threshold needs the count materialized, which only the exhaustive
    path produces. Exclusion contract applies pre-heap per subquery."""
    se = get_searcher(spark, index_dir, cell_parts)
    sub: list[tuple[int, str]] = []
    for qid, text in queries:
        terms = sorted(set(tokenize(text)))
        if len(terms) > _DIS_MAX_WIDTH:
            raise ValueError(
                f"query {qid} has {len(terms)} terms > {_DIS_MAX_WIDTH}"
            )
        sub.extend((qid * _DIS_MAX_WIDTH + i, t) for i, t in enumerate(terms))
    empty = spark.createDataFrame(
        [],
        "query_id int, rank int, url string, score6 long, "
        "n_matched long, req long",
    )
    if not sub:
        return empty
    scored, parts = _search_impl(
        se, sub, k, "dense", fixed_point=True, raw_scored=True
    )
    agg = (
        scored.withColumn(
            "query_id",
            F.expr(f"query_id div {_DIS_MAX_WIDTH}").cast("int"),
        )
        .groupBy("query_id", "doc_id", "part_id", "local_pos")
        .agg(
            F.count("*").alias("n_matched"),
            F.floor(F.sum("score") * 1_000_000).cast("long").alias("score6"),
        )
    )
    ext = spark.read.parquet(se.paths.docs_extracted).select(
        F.col("part_id").cast("int").alias("part_id"), "local_pos", "url"
    )
    if parts is not None and 2 * len(parts) < len(se.grid_parts):
        ext = ext.filter(F.col("part_id").isin(sorted(parts)))
    keyed = (
        agg.join(ext, ["part_id", "local_pos"])
        .join(
            required.select(
                "url", F.col("required").cast("long").alias("req")
            ),
            "url",
        )
        .filter(F.col("n_matched") >= F.col("req"))
    )
    order = (F.desc("score6"), F.asc("doc_id"))
    w_part = Window.partitionBy("query_id", "part_id").orderBy(*order)
    w_all = Window.partitionBy("query_id").orderBy(*order)
    return (
        keyed.withColumn("pr", F.row_number().over(w_part))
        .filter(F.col("pr") <= k)
        .withColumn("rank", F.row_number().over(w_all))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "url", "score6", "n_matched", "req")
    )


def more_like_this(
    spark: SparkSession,
    index_dir: str,
    seeds: list[tuple[int, str]],
    k: int = 10,
    max_terms: int = 10,
    mode: str = "bmw",
    cell_parts: int = 4,
    fixed_point: bool = False,
) -> DataFrame:
    """Similar-document retrieval (Lucene ``MoreLikeThis`` shape): for each
    ``(query_id, seed_url)``, rank the docs most similar to the seed ->
    (query_id, rank, url, score). The seed's ``max_terms`` most
    characteristic terms — by ``floor(tf * idf * 1e6)`` desc with term-asc
    tie-break, the classic tf·idf interestingness key, floored so the
    DuckDB twin selects the identical set — form an unweighted OR query
    that runs through the ordinary BM25 plan; the seed itself never
    appears in its own results.

    Plan shape: one url-pushed, column-pruned extracts scan fetches the
    seeds' text (O(seeds) rows); term stats come from the Searcher's idf
    cache (pruned term_stats reads); then ONE standard search at k+1
    whose winners drop the seed and re-rank — exact, because removing at
    most one row from an exact top-(k+1) leaves an exact top-k, and docID
    order == url order makes the url tie-break identical to the kernel's
    doc_id tie-break. A seed url the index never ingested (or whose terms
    all left the index) contributes no result rows."""
    import math
    from collections import Counter

    se = get_searcher(spark, index_dir, cell_parts)
    urls = sorted({u for _, u in seeds})
    rows = (
        spark.read.parquet(se.paths.docs_extracted)
        .filter(F.col("url").isin(urls))
        .select("url", "text")
        .collect()
    )
    text_by_url = {r["url"]: r["text"] for r in rows}
    queries: list[tuple[int, str]] = []
    for qid, url in seeds:
        txt = text_by_url.get(url)
        if txt is None:
            continue
        tf = Counter(tokenize(txt))
        _ensure_idf(se, sorted(tf))
        keyed = sorted(
            (-math.floor(n * idf * 1_000_000), t)
            for t, n in tf.items()
            if (idf := se._idf_cache.get(t)) is not None
        )
        sel = [t for _, t in keyed[:max_terms]]
        if sel:
            queries.append((qid, " ".join(sel)))
    out_schema = "query_id int, rank int, url string, score double"
    if not queries:
        return spark.createDataFrame([], out_schema)
    res = se.search(queries, k=k + 1, mode=mode, fixed_point=fixed_point)
    seed_df = spark.createDataFrame(seeds, "sq int, seed_url string")
    survivors = res.join(
        F.broadcast(seed_df),
        (res["query_id"] == seed_df["sq"]) & (res["url"] == seed_df["seed_url"]),
        "left_anti",
    )
    order_key = (
        F.floor(F.col("score") * 1_000_000).cast("long")
        if fixed_point
        else F.col("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc(order_key), F.asc("url"))
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "url", "score")
    )


def search_snippets(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    window: int = 3,
    mode: str = "bmw",
    cell_parts: int = 4,
    fixed_point: bool = False,
    prune_norms: bool | None = None,
) -> DataFrame:
    """Top-k BM25 with a per-winner SNIPPET: the ``window``-token context
    around the first occurrence of any (positive) query term ->
    (query_id, rank, url, score, snippet). The search-UI surface the
    reference approximates by returning whole node text
    (/root/reference/README.md:179-188) — at web scale whole documents are
    the wrong payload, so winners carry a bounded excerpt instead.

    Plan shape: identical to ``search(with_text=True)`` (pruned postings
    scan, cell cogroup, winners'-partitions-only text fetch); the snippet
    is a JVM codegen projection over the <= queries x k winner rows
    (``functions.sqlglue`` expressions — the DuckDB twin computes the
    SAME first-hit index and window, so snippets hash-match across
    engines). Every winner contains >= 1 positive query term by
    construction, so the first-hit index always exists."""
    from ..functions.sqlglue import (
        SPARK_FIRST_HIT,
        SPARK_SNIP,
        spark_terms,
    )

    res = search(
        spark, index_dir, queries, k=k, mode=mode, cell_parts=cell_parts,
        fixed_point=fixed_point, with_text=True, prune_norms=prune_norms,
    )
    df = res.withColumn("tk", F.expr(spark_terms("text")))
    hit = F.lit(None).cast("int")
    for qid, text in queries:
        pos, _ = parse_query(text)
        terms = sorted(set(tokenize(pos)))
        if not terms:
            continue
        lits = ", ".join(f"'{t}'" for t in terms)  # tokens are [a-z0-9]+
        hit = F.when(
            F.col("query_id") == qid,
            F.expr(SPARK_FIRST_HIT.format(tk="tk", terms=lits)),
        ).otherwise(hit)
    df = df.withColumn("hit", hit)
    s = f"greatest(1, hit - {int(window)})"
    e = f"least(size(tk), hit + {int(window)})"
    return df.withColumn(
        "snippet", F.expr(SPARK_SNIP.format(tk="tk", s=s, e=e))
    ).select("query_id", "rank", "url", "score", "snippet")


def _slice_mapper(bc_grid):
    """Map-side run -> docID-grid-cell slicer for ``mapInArrow`` (shared by
    the top-k search plan and the full-match count/facet plans in
    plans/hits.py). ``bc_grid`` is the broadcast cell grid."""

    def slice_runs(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        grid = bc_grid.value
        for batch in batches:
            # Columnar rehydration: one to_pylist per column per batch (the
            # run count for a heavy term grows with build partitions at
            # scale — per-row pandas iterrows() was the round-1 hot spot).
            # The Python loop below is bounded by runs-per-query-term per
            # batch (blob work stays zero-decode byte slicing); if per-term
            # run counts ever grow past ~10^4 (e.g. an unfolded index at
            # extreme P), move the slicing to a numpy pass over the offsets.
            cols = {name: batch.column(name).to_pylist() for name in batch.schema.names}
            terms_col = cols["term"]
            out = {n: [] for n, _ in _SLICE_FIELDS}
            for ridx in range(batch.num_rows):
                row = {name: vals[ridx] for name, vals in cols.items()}
                run = run_from_row(row)
                for cell, sub in slice_run_to_cells(run, grid):
                    out["cell"].append(cell)
                    out["term"].append(terms_col[ridx])
                    out["first_doc"].append(sub.first_doc)
                    out["last_doc"].append(sub.last_doc)
                    out["n_docs"].append(sub.n_docs)
                    out["doc_blob"].append(sub.doc_blob)
                    out["tf_blob"].append(sub.tf_blob)
                    out["bm_last"].append(sub.bm_last.tolist())
                    out["bm_maxq"].append(sub.bm_maxq.tolist())
                    out["bm_doc_off"].append(sub.bm_doc_off.tolist())
                    out["bm_tf_off"].append(sub.bm_tf_off.tolist())
                    out["bm_ndocs"].append(sub.bm_ndocs.tolist())
            if out["cell"]:
                yield from pa.table(out, schema=_SLICE_PA).to_batches()

    return slice_runs


# Local scoring fast path (r6): when a query's PRUNED inputs — the term
# buckets' postings files plus the norms relation — total under this many
# bytes on disk, the scoring runs driver-side through the IDENTICAL cell
# kernels (same _slice_mapper, same score_cell closure) instead of paying a
# Spark job's fixed overhead (~0.7-1.2 s here: two Python stages + two
# exchanges) to move a few MB. This is the ES/Lucene observation that a
# small searchable segment does not need a cluster pass; the decision is a
# per-query metadata check (os.stat over <= |buckets| dirs), the threshold
# is parameterised, and any index over the bound — every real-scale index —
# takes the distributed cogroup exactly as before. No results are cached:
# every call re-reads the committed parquet.
LOCAL_QUERY_MAX_BYTES = int(
    os.environ.get("SPARK_GRAFT_LOCAL_QUERY_MAX_BYTES", str(64 * 1024 * 1024))
)

_RUN_COLS = [
    "term", "first_doc", "last_doc", "n_docs", "doc_blob", "tf_blob",
    "bm_last", "bm_maxq", "bm_doc_off", "bm_tf_off", "bm_ndocs",
]


class _LocalVal:
    """Driver-local stand-in for a Broadcast (same ``.value`` contract) so
    the scoring closures are byte-identical between the two paths."""

    __slots__ = ("value",)

    def __init__(self, value):
        self.value = value


def _dir_parquet_bytes(path: str) -> int:
    total = 0
    for f in os.listdir(path):
        if f.endswith(".parquet") and not f.startswith(("_", ".")):
            total += os.stat(os.path.join(path, f)).st_size
    return total


def _postings_bucket_dirs(se: Searcher, buckets: list[int]) -> list[str]:
    prefixes = (
        [""]
        if se.committed_deltas is None
        else [f"delta={g}/" for g in se.committed_deltas]
    )
    return [f"{p}bucket={b}" for p in prefixes for b in buckets]


def _norms_files(se: Searcher) -> list[str]:
    roots = (
        [se.paths.norms]
        if se.committed_deltas is None
        else [
            os.path.join(se.paths.norms, f"delta={g}")
            for g in se.committed_deltas
        ]
    )
    files: list[str] = []
    for r in roots:
        if not os.path.isdir(r):
            raise FileNotFoundError(r)
        files.extend(
            os.path.join(r, f)
            for f in sorted(os.listdir(r))
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
    return files


def _local_query_bytes(se: Searcher, buckets: list[int]) -> int | None:
    """On-disk bytes of the query's pruned inputs, or None when the layout
    is not local parquet (caller then takes the distributed path)."""
    try:
        if se._norms_disk_bytes is None:
            se._norms_disk_bytes = sum(
                os.stat(f).st_size for f in _norms_files(se)
            )
        total = se._norms_disk_bytes
        for d in _postings_bucket_dirs(se, buckets):
            sub = os.path.join(se.paths.postings, d)
            if os.path.isdir(sub):
                total += _dir_parquet_bytes(sub)
        return total
    except OSError:
        return None


def _score_local(se: Searcher, buckets: list[int], present: list[str], score_cell):
    """Driver-side mirror of the slices/norms cell cogroup: read the pruned
    runs, slice with the SAME mapper, score each cell with the SAME closure.
    Returns the scored candidate rows as plain dicts."""
    import pyarrow.parquet as pq

    tables = []
    for d in _postings_bucket_dirs(se, buckets):
        sub = os.path.join(se.paths.postings, d)
        if not os.path.isdir(sub):
            continue
        for f in sorted(os.listdir(sub)):
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                tables.append(
                    pq.read_table(
                        os.path.join(sub, f),
                        columns=_RUN_COLS,
                        filters=[("term", "in", present)],
                    )
                )
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return []
    runs_t = pa.concat_tables(tables)
    mapper = _slice_mapper(_LocalVal(se.cell_grid))
    slice_batches = list(mapper(iter(runs_t.to_batches())))
    if not slice_batches:
        return []
    slices_pdf = pa.Table.from_batches(slice_batches).to_pandas()
    norms_pdf = se._local_norms_pdf()
    out = []
    for cell, s_pdf in slices_pdf.groupby("cell"):
        res = score_cell(s_pdf, norms_pdf[norms_pdf["cell"] == cell])
        if len(res):
            out.append(res)
    if not out:
        return []
    return pd.concat(out, ignore_index=True).to_dict("records")


def _parts_for_runs(
    ranges: list[tuple[int, int]],
    cell_grid,
    cell_parts: int,
    total_parts: int,
) -> list[int] | None:
    """Build partitions whose docID span can intersect any of the given run
    ``[first_doc, last_doc]`` ranges — driver-side, metadata only. Returns
    None when pruning is useless (runs cover most cells, or the part list
    would be huge); the caller then ships the full norms relation as
    before. Superset-safe: a part with no matching postings merely adds an
    empty cogroup side."""
    n_cells = len(cell_grid)
    cells: set[int] = set()
    for first, last in ranges:
        c0 = int(np.searchsorted(cell_grid, first, side="right")) - 1
        c1 = int(np.searchsorted(cell_grid, last, side="right")) - 1
        cells.update(range(max(c0, 0), min(c1, n_cells - 1) + 1))
    if 2 * len(cells) >= n_cells:
        return None
    parts = [
        p
        for c in sorted(cells)
        for p in range(c * cell_parts, min((c + 1) * cell_parts, total_parts))
    ]
    return parts if len(parts) <= 8192 else None


def _param_bound_scale(k1: float, b: float) -> float:
    """Inflation factor that keeps build-time block-max bounds valid under
    query-time (k1, b) overrides. Returns 1.0 at the index constants.

    Proof. bm_maxq records max block quality at the INDEX constants
    (K1, B) = (BM25_K1, BM25_B). With x = dl/avgdl > 0 and tf >= 1, the
    per-posting quality ratio is

        q(k1, b) / q(K1, B) = (tf + K1*(1-B+B*x)) / (tf + k1*(1-b+b*x)).

    For fixed x this is (tf+A)/(tf+C), monotone in tf, so its sup over
    tf >= 1 is max(1, (1+A)/(1+C)). (1+A)/(1+C) is a Möbius function of x
    (both A and C are affine in x), hence monotone in x, so its sup over
    x in (0, inf) is attained at an endpoint:

        x -> 0:   (1 + K1*(1-B)) / (1 + k1*(1-b))
        x -> inf: (K1*B) / (k1*b)            (infinite when b = 0).

    max(1, those two) therefore bounds q(k1,b)/q(K1,B) everywhere, so
    ub_weight = idf*(k1+1) * factor * bm_maxq stays an upper bound of the
    true contribution idf*(k1+1)*q(k1,b). The b=0 infinity is absorbed by
    TermCursor's unconditional cap ub <= idf*(k1+1) (quality <= 1
    pointwise). The factor bounds a ratio at FIXED avgdl, and the expunge
    factor (plans/expunge.py) bounds the avgdl-drift ratio at FIXED
    parameters, so their product bounds the joint ratio — _search_impl
    multiplies them."""
    if not (k1 > 0.0) or not (0.0 <= b <= 1.0):
        raise ValueError(
            f"BM25 overrides need k1 > 0 and 0 <= b <= 1, got k1={k1} b={b}"
        )
    if k1 == BM25_K1 and b == BM25_B:
        return 1.0
    at_zero = (1.0 + BM25_K1 * (1.0 - BM25_B)) / (1.0 + k1 * (1.0 - b))
    at_inf = (BM25_K1 * BM25_B) / (k1 * b) if b > 0.0 else math.inf
    return max(1.0, at_zero, at_inf)


def _resolve_filter_ids(se: Searcher, filter_urls: DataFrame) -> np.ndarray:
    """Resolve a filter's URL set to the index's docIDs (sorted int64):
    docID = grid[part_id] + local_pos, via ONE scan of the extracts that is
    column-pruned to (url, part_id, local_pos) and broadcast-joined on the
    filter — the same resolution plans/deletes.py uses for tombstones.
    URLs the index never ingested resolve to nothing (filter-by-key over a
    corpus that may not contain them)."""
    offsets = se.spark.createDataFrame(
        [(p, int(g)) for p, g in enumerate(se.meta["grid"])],
        "part_id int, offset long",
    )
    rows = (
        se.spark.read.parquet(se.paths.docs_extracted)
        .select(F.col("part_id").cast("int").alias("part_id"), "local_pos", "url")
        .join(F.broadcast(filter_urls.select("url").distinct()), "url")
        .join(F.broadcast(offsets), "part_id")
        .select((F.col("offset") + F.col("local_pos")).cast("long").alias("doc_id"))
        .collect()
    )
    return np.sort(np.asarray([r["doc_id"] for r in rows], dtype=np.int64))


def _resolve_cursor_ids(se: Searcher, urls: list[str]) -> dict[str, int]:
    """Resolve search_after cursor urls to docIDs (url -> docID) with the
    same ONE column-pruned broadcast-joined extracts scan as
    ``_resolve_filter_ids``. Cursors come from a previous page's rows, so
    every url must exist in the index — a miss raises (a silent drop would
    turn the tie-break into 'all ties admitted', silently duplicating
    rows across pages)."""
    want = sorted(set(urls))
    url_df = se.spark.createDataFrame([(u,) for u in want], "url string")
    offsets = se.spark.createDataFrame(
        [(p, int(g)) for p, g in enumerate(se.meta["grid"])],
        "part_id int, offset long",
    )
    rows = (
        se.spark.read.parquet(se.paths.docs_extracted)
        .select(F.col("part_id").cast("int").alias("part_id"), "local_pos", "url")
        .join(F.broadcast(url_df), "url")
        .join(F.broadcast(offsets), "part_id")
        .select(
            "url",
            (F.col("offset") + F.col("local_pos")).cast("long").alias("doc_id"),
        )
        .collect()
    )
    out = {r["url"]: int(r["doc_id"]) for r in rows}
    missing = [u for u in want if u not in out]
    if missing:
        raise ValueError(
            f"search_after cursor urls not in the index: {missing}"
        )
    return out


def _pruned_parquet_rows(
    root: str,
    part_dirs: list[str],
    columns: list[str],
    filters=None,
) -> list[dict]:
    """Driver-side pruned parquet read: ``root/<part_dir>/*.parquet`` files,
    the named columns only, optional row-group/page-level ``filters``
    (pyarrow predicate pushdown). Raises FileNotFoundError into the caller's
    Spark fallback when a partition dir is absent."""
    import pyarrow.parquet as pq

    out: list[dict] = []
    for d in part_dirs:
        sub = os.path.join(root, d)
        if not os.path.isdir(sub):
            continue
        for f in sorted(os.listdir(sub)):
            if not f.endswith(".parquet") or f.startswith(("_", ".")):
                continue
            t = pq.read_table(
                os.path.join(sub, f), columns=columns, filters=filters
            )
            out.extend(t.to_pylist())
    return out


def _ensure_idf(se: Searcher, terms: list[str]) -> None:
    """Fill the Searcher's idf cache for ``terms`` with ONE bucket- and
    term-pruned term_stats read covering the misses (None caches an absent
    term). Shared by the BM25 paths and the positional phrase path.

    r6: the read happens DRIVER-SIDE with pyarrow (same directory pruning
    to the misses' buckets, same term predicate pushed to parquet row
    groups) instead of a sequential Spark job — the result was always
    collected to the driver to build the query payload anyway, and the
    pruned slice is O(queried buckets' vocabulary), metadata-class at any
    corpus size. Saves one full job launch per cold-term query batch
    (~0.3-0.5 s of fixed overhead in this sandbox; guide §1.2 per-task vs
    structural costs). Iceberg-backed indexes (no local parquet layout)
    and any unexpected layout fall back to the original Spark read."""
    from ..functions.murmur3 import term_bucket

    misses = [t for t in terms if t not in se._idf_cache]
    if not misses:
        return
    miss_buckets = sorted({term_bucket(t, se.n_buckets) for t in misses})
    rows: list[dict] | None = None
    if se.iceberg_table is None:
        try:
            prefix = (
                f"delta={max(se.committed_deltas)}/"
                if se.committed_deltas is not None
                else ""
            )
            rows = _pruned_parquet_rows(
                se.paths.term_stats,
                [f"{prefix}bucket={b}" for b in miss_buckets],
                ["term", "df"],
                filters=[("term", "in", misses)],
            )
        except Exception:
            rows = None  # fall back to the Spark read below
    if rows is None:
        ts = se.spark.read.parquet(se.paths.term_stats)
        if se.committed_deltas is not None:
            # streamed: term_stats is VERSIONED per refresh; pin to the
            # committed max delta (a crashed refresh's recompute includes
            # uncommitted docs' df — idf drift on the committed index).
            ts = ts.filter(F.col("delta") == max(se.committed_deltas))
        rows = [
            r.asDict()
            for r in ts.filter(
                F.col("bucket").isin(miss_buckets) & F.col("term").isin(misses)
            )
            .select("term", "df")
            .collect()
        ]
    found = {r["term"]: idf_value(se.n_docs, int(r["df"])) for r in rows}
    for t in misses:
        se._idf_cache[t] = found.get(t)


def _search_impl(
    se: Searcher,
    queries: list[tuple[int, str]],
    k: int,
    mode: str,
    fixed_point: bool = False,
    with_text: bool = False,
    tie_margin: int = FIXED_POINT_TIE_MARGIN,
    prune_norms: bool | None = None,
    min_match: int = 2,
    offset: int = 0,
    filter_urls: DataFrame | None = None,
    k1: float | None = None,
    b: float | None = None,
    search_after: dict[int, tuple[int, str]] | None = None,
    raw_scored: bool = False,
) -> DataFrame:
    from ..functions.murmur3 import term_bucket

    if prune_norms is None:  # auto: prune once the norms relation is big
        prune_norms = se.n_docs >= PRUNE_NORMS_AUTO_MIN_DOCS
    if search_after:
        if not fixed_point:
            raise ValueError(
                "search_after requires fixed_point=True (the cursor is "
                "defined over the floored score6 rank key)"
            )
        if offset:
            raise ValueError("search_after and offset are mutually exclusive")
    # raw_scored (internal; search_collapse): return the FULL scored match
    # set as (query_id, doc_id, part_id, local_pos, score) rows — no per-cell
    # truncate, no global rank, no url lookup — plus the driver-side build-
    # partition prune list. Exhaustive modes only (BMW's contract is top-k).
    if raw_scored:
        if mode not in ("dense", "conjunctive", "msm"):
            raise ValueError(
                f"raw_scored requires an exhaustive mode, got {mode!r}"
            )
        if search_after or offset:
            raise ValueError(
                "raw_scored returns the full match set; paging does not apply"
            )

    spark = se.spark
    paths = se.paths
    n_docs, avgdl, n_buckets = se.n_docs, se.avgdl, se.n_buckets
    # Query-time BM25 parameter overrides (Lucene per-query similarity
    # config): the exhaustive kernels just evaluate at (q_k1, q_b); BMW's
    # build-time block-max bounds inflate by the provable parameter factor
    # (_param_bound_scale), composed multiplicatively with the expunge
    # avgdl factor — each bounds a ratio at a fixed value of the other's
    # variable, so the product bounds the joint drift.
    q_k1 = BM25_K1 if k1 is None else float(k1)
    q_b = BM25_B if b is None else float(b)
    bound_scale = se.bound_scale * _param_bound_scale(q_k1, q_b)
    cell_grid = se.cell_grid
    # Tie margin: per-cell heaps order by RAW score; two docs < 1e-6 apart
    # share a floored cell but may sit in opposite raw order. Keeping a few
    # extra candidates per cell makes the floored global cut exact unless
    # > margin docs land in one 1e-6 cell right at the boundary.
    # Paging: ranks (offset, offset+k] of the GLOBAL order — every per-cell
    # heap must hold offset+k candidates for the page to be exact.
    cell_k = k + offset + (tie_margin if fixed_point else 0)
    out_schema = "query_id int, rank int, url string, score double" + (
        ", text string" if with_text else ""
    )
    _RAW_DDL = "query_id int, doc_id long, part_id int, local_pos long, score double"
    if raw_scored:
        empty = (se._empty_df(_RAW_DDL), None)
    else:
        empty = se._empty_df(out_schema)

    # Filtered search (Lucene filter context): the allowed docID set masks
    # candidates pre-heap as an INCLUSION — the mirror of the tombstone /
    # '-term' exclusion contract. Resolved once per call, broadcast once.
    bc_allowed = None
    if filter_urls is not None:
        allowed_ids = _resolve_filter_ids(se, filter_urls)
        if allowed_ids.size == 0:
            return empty  # filter admits nothing — no doc can rank
        bc_allowed = spark.sparkContext.broadcast(allowed_ids)

    # search_after cursors (docstring on ``search``): per-query
    # (score6, doc_id) admission tuples, resolved with one pruned extracts
    # scan and broadcast. Applied PRE-HEAP in every kernel, so page depth
    # never deepens a heap (the offset path's cost model).
    bc_after = None
    if search_after:
        url_ids = _resolve_cursor_ids(
            se, [u for _s6, u in search_after.values()]
        )
        bc_after = spark.sparkContext.broadcast(
            {qid: (int(s6), url_ids[u]) for qid, (s6, u) in search_after.items()}
        )

    # 'term^2.5' boosts (functions/tokenizer.parse_boost_query) fold into
    # the per-(query, term) idf BEFORE it ships in the payload — every
    # scoring kernel (dense/conjunctive/msm and BMW's block-max bounds,
    # which scale linearly in idf) stays exact with zero kernel changes.
    boost_parsed = {qid: parse_boost_query(text) for qid, text in queries}
    boosts = {qid: b for qid, (_t, b) in boost_parsed.items() if b}
    # '-term' boolean NOT (functions/tokenizer.parse_query): negated terms
    # never score — their postings become a per-query exclusion mask fed
    # through the SAME pre-heap path as tombstoned docs, so an excluded doc
    # can never displace a survivor and survivors' scores are untouched.
    parsed = {qid: parse_query(txt) for qid, (txt, _b) in boost_parsed.items()}
    qterms = {qid: sorted(set(tokenize(pos))) for qid, (pos, _) in parsed.items()}
    qneg = {qid: negs for qid, (_, negs) in parsed.items() if negs}
    terms = sorted(
        {t for ts in qterms.values() for t in ts}
        | {t for ns in qneg.values() for t in ns}
    )
    if not terms:
        return empty

    # Buckets per term are computed driver-side (no Spark job; the Python
    # murmur3 matches F.hash) for both the term_stats and postings prunes.
    # idf per term: cache hits skip the term_stats job; only unseen terms
    # trigger a pruned read (None caches an absent term).
    _ensure_idf(se, terms)
    idf = {t: v for t in terms if (v := se._idf_cache[t]) is not None}
    payload = [
        (
            qid,
            [
                (t, idf[t] * boosts.get(qid, {}).get(t, 1.0))
                for t in qts
                if t in idf
            ],
        )
        for qid, qts in qterms.items()
    ]
    payload = [(qid, tl) for qid, tl in payload if tl]
    if mode == "conjunctive":
        # AND semantics: a query term the index has never seen means NO doc
        # can match — drop the query here rather than intersecting the
        # remaining terms (which would silently widen the semantics).
        payload = [
            (qid, tl) for qid, tl in payload if len(tl) == len(qterms[qid])
        ]
    msm_by_qid: dict[int, int] = {}
    if mode == "msm":
        # minimum_should_match: the requirement clamps to the query's TOTAL
        # term count (index-absent terms included — they can never match, so
        # they only reduce what's achievable, exactly like the SQL twin's
        # least(m, nt) over all query terms). Queries with fewer PRESENT
        # terms than their requirement can never be satisfied — drop them
        # driver-side rather than scoring cells for a provably-empty result.
        msm_by_qid = {
            qid: min(min_match, len(qts)) for qid, qts in qterms.items()
        }
        payload = [
            (qid, tl) for qid, tl in payload if len(tl) >= msm_by_qid[qid]
        ]
    if not payload:
        return empty
    # Scan prunes to PRESENT terms only (absent terms would widen the
    # bucket IN-list for directories that can't contribute runs).
    present = sorted(idf)
    buckets = sorted({term_bucket(t, n_buckets) for t in present})
    # Local fast path eligibility (see LOCAL_QUERY_MAX_BYTES): a per-query
    # metadata check over the pruned inputs' on-disk bytes. raw_scored
    # consumers expect a DataFrame and Iceberg has no local files — both
    # always go distributed.
    local_bytes = (
        _local_query_bytes(se, buckets)
        if (not raw_scored and se.iceberg_table is None)
        else None
    )
    local_mode = local_bytes is not None and local_bytes <= LOCAL_QUERY_MAX_BYTES

    def _bc(v):
        # identical .value contract either way; in local mode the scoring
        # closure runs on the driver, so no broadcast RPC is needed.
        return _LocalVal(v) if local_mode else spark.sparkContext.broadcast(v)

    bc_payload = _bc(payload)
    bc_grid = se._bc_grid  # per-Searcher constant, broadcast once
    # Negated terms PRESENT in the index (an absent neg term excludes
    # nothing). Their postings ride the same pruned scan as scoring terms —
    # `terms`/`idf` above already include them — but never enter the
    # scoring payload.
    neg_payload = {
        qid: [t for t in ns if se._idf_cache.get(t) is not None]
        for qid, ns in qneg.items()
    }
    neg_payload = {qid: ns for qid, ns in neg_payload.items() if ns}
    bc_neg = _bc(neg_payload) if neg_payload else None

    runs = None
    if not local_mode:
        runs = read_index_runs(
            spark, paths.postings, n_buckets, se.iceberg_table
        ).filter(F.col("bucket").isin(buckets) & F.col("term").isin(present))
        if se.committed_deltas is not None:
            # streamed: uncommitted delta dirs (crashed refresh) invisible.
            runs = runs.filter(F.col("delta").isin(se.committed_deltas))

        # "delta" exists only on incrementally-refreshed streamed indexes
        # (one partition per refresh group); drop() is lenient so batch
        # indexes pass through unchanged. Runs across deltas stay
        # docID-disjoint per term.
        slices = runs.drop("bucket", "run_id", "n_bytes", "delta").mapInArrow(
            _slice_mapper(bc_grid), schema=_SLICE_DDL
        )

    norms = se.norms
    raw_parts: list[int] | None = None
    if not local_mode and (prune_norms or raw_scored):
        # One metadata-only job (blobs column-pruned away) + a driver map
        # from run docID ranges to grid cells -> the norms cogroup side
        # shuffles only the partitions the query can actually touch (and
        # raw_scored callers prune their url-join extracts scan the same
        # way).
        ranges = [
            (int(r["first_doc"]), int(r["last_doc"]))
            for r in runs.select("first_doc", "last_doc").collect()
        ]
        parts = _parts_for_runs(
            ranges, cell_grid, se.cell_parts, len(se.grid_parts)
        )
        raw_parts = parts
        if prune_norms and parts is not None:
            norms = norms.filter(F.col("part_id").isin(parts))
    use_dense = mode in ("dense", "conjunctive", "msm")
    conjunctive = mode == "conjunctive"
    bc_msm = _bc(msm_by_qid) if msm_by_qid else None
    bc_deleted = (
        _bc(se.deleted_ids)
        if se.deleted_ids is not None and len(se.deleted_ids)
        else None
    )

    bc_fullgrid = (
        spark.sparkContext.broadcast(se.grid_parts) if raw_scored else None
    )

    def _empty_cell() -> pd.DataFrame:
        cols = {"query_id": "int32", "doc_id": "int64", "score": "float64"}
        if raw_scored:
            cols.update({"part_id": "int32", "local_pos": "int64"})
        return pd.DataFrame({c: [] for c in cols}).astype(cols)

    def score_cell(slices_pdf: pd.DataFrame, norms_pdf: pd.DataFrame) -> pd.DataFrame:
        if slices_pdf.empty or norms_pdf.empty:
            return _empty_cell()
        from ..operators.codec import vb_decode

        term_runs = assemble_cell_runs(slices_pdf)
        nrows = norms_pdf.sort_values("first_doc")
        lo = int(nrows["first_doc"].iloc[0])
        dl = np.concatenate(
            [vb_decode(bytes(b)) for b in nrows["dl_blob"]]
        ).astype(np.float64)
        # contiguity: each part's range must abut the next
        expect = lo
        for _, r in nrows.iterrows():
            if int(r["first_doc"]) != expect:  # survives python -O
                raise ValueError("norms ranges not contiguous")
            expect += int(r["n_docs"])
        norms_obj = CellNorms(lo, dl)
        cell_allowed = None
        bmw_allowed = None
        if bc_allowed is not None:
            aa = bc_allowed.value
            a = np.searchsorted(aa, lo)
            b = np.searchsorted(aa, lo + len(dl))
            if b == a:
                # no filter-passing doc lives in this cell: skip it before
                # decoding a single posting block.
                return _empty_cell()
            cell_allowed = aa[a:b]
            bmw_allowed = frozenset(cell_allowed.tolist())
        cell_deleted = None
        if bc_deleted is not None:
            dd = bc_deleted.value
            a = np.searchsorted(dd, lo)
            b = np.searchsorted(dd, lo + len(dl))
            if b > a:
                cell_deleted = dd[a:b]
        bmw_deleted = (
            frozenset(cell_deleted.tolist()) if cell_deleted is not None else None
        )
        # NOT terms: decode each negated term's cell postings ONCE (shared
        # across the query batch), then union with the tombstone mask per
        # query. Cost is the same class as scoring the term — the exact
        # semantics of exclusion.
        neg_docs_by_term: dict[str, np.ndarray] = {}
        if bc_neg is not None:
            from ..operators.runfmt import decode_run

            for t in {t for ns in bc_neg.value.values() for t in ns}:
                if t in term_runs:
                    neg_docs_by_term[t] = decode_run(term_runs[t])[0].astype(
                        np.int64
                    )
        qids, dids, scores = [], [], []
        for qid, term_idf in bc_payload.value:
            if not any(t in term_runs for t, _ in term_idf):
                continue
            q_excl = cell_deleted
            if bc_neg is not None and qid in bc_neg.value:
                arrs = [
                    neg_docs_by_term[t]
                    for t in bc_neg.value[qid]
                    if t in neg_docs_by_term
                ]
                if arrs:
                    if q_excl is not None:
                        arrs.append(q_excl)
                    q_excl = (
                        np.unique(np.concatenate(arrs))
                        if len(arrs) > 1
                        else arrs[0]
                    )
            if use_dense:
                if bc_msm is not None:
                    d, s = msm_score_cell(
                        term_runs, norms_obj, term_idf, avgdl,
                        bc_msm.value[qid], deleted=q_excl,
                        allowed=cell_allowed, k1=q_k1, b=q_b,
                    )
                else:
                    scorer = (
                        conjunctive_score_cell if conjunctive else dense_score_cell
                    )
                    d, s = scorer(
                        term_runs, norms_obj, term_idf, avgdl, deleted=q_excl,
                        allowed=cell_allowed, k1=q_k1, b=q_b,
                    )
                if bc_after is not None and qid in bc_after.value:
                    # cursor admission BEFORE the truncate: docs at-or-
                    # before the cursor must not occupy candidate slots.
                    cs6, cdid = bc_after.value[qid]
                    s6 = np.floor(s * 1_000_000).astype(np.int64)
                    keep = (s6 < cs6) | ((s6 == cs6) & (d > cdid))
                    d, s = d[keep], s[keep]
                if len(d) > cell_k and not raw_scored:
                    # local truncate to cell_k best (score desc, doc asc)
                    order = np.lexsort((d, -s))[:cell_k]
                    d, s = d[order], s[order]
                pairs = list(zip(d.tolist(), s.tolist()))
            else:
                q_excl_set = (
                    bmw_deleted
                    if q_excl is cell_deleted
                    else frozenset(q_excl.tolist())
                )
                pairs = bmw_score_cell(
                    term_runs, norms_obj, term_idf, avgdl, cell_k,
                    deleted=q_excl_set, bound_scale=bound_scale,
                    allowed=bmw_allowed, k1=q_k1, b=q_b,
                    after=(
                        bc_after.value.get(qid)
                        if bc_after is not None
                        else None
                    ),
                )
            for did, sc in pairs:
                qids.append(qid)
                dids.append(did)
                scores.append(sc)
        out = {
            "query_id": np.array(qids, dtype=np.int32),
            "doc_id": np.array(dids, dtype=np.int64),
            "score": np.array(scores, dtype=np.float64),
        }
        if raw_scored:
            # (part_id, local_pos) per row, vectorized off the full grid —
            # raw consumers join the extracts on these coordinates with the
            # same partition-pruned scan as _rank_and_lookup's url lookup.
            g = bc_fullgrid.value
            pid = np.searchsorted(g, out["doc_id"], side="right") - 1
            out["part_id"] = pid.astype(np.int32)
            out["local_pos"] = out["doc_id"] - g[pid]
        return pd.DataFrame(out)

    cell_schema = "query_id int, doc_id long, score double" + (
        ", part_id int, local_pos long" if raw_scored else ""
    )
    if local_mode:
        # zero Spark jobs: same mapper, same score_cell closure, same
        # per-cell inputs — identity pinned by
        # tests/test_r06_optimizations.py::test_local_fast_path_equals_cogroup.
        scored = _score_local(se, buckets, present, score_cell)
    else:
        scored = (
            slices.groupBy("cell")
            .cogroup(norms.groupBy("cell"))
            .applyInPandas(score_cell, schema=cell_schema)
        )

    if raw_scored:
        return scored, raw_parts
    return _rank_and_lookup(
        se, scored, k, fixed_point, with_text, empty, offset=offset,
        max_candidate_rows=len(cell_grid) * cell_k * len(payload),
    )


# Candidate-row bound under which the global rank runs DRIVER-SIDE over the
# collected per-cell candidates instead of through a Spark window (one fewer
# exchange + stage per query, ~0.3-0.4 s of fixed overhead here). The bound
# is cells x per-cell-k x queries — known BEFORE execution, so the choice is
# plan-time and scale-adaptive: a 10^12-doc index (millions of cells) always
# takes the window path. Ordering semantics are identical by construction
# (same (key desc, doc_id asc) total order, same floor fixed-point key).
DRIVER_RANK_MAX_ROWS = 131_072


def _rank_and_lookup(
    se: "Searcher",
    scored: DataFrame,
    k: int,
    fixed_point: bool,
    with_text: bool,
    empty: DataFrame,
    offset: int = 0,
    max_candidate_rows: int | None = None,
) -> DataFrame:
    """Shared tail of every retrieval path ((query_id, doc_id, score) ->
    ranked winners with urls): global rank over the candidate rows, then a
    url lookup that reads ONLY the winners' partitions."""
    spark, paths = se.spark, se.paths
    out_schema = empty.schema
    if isinstance(scored, list) or (
        max_candidate_rows is not None
        and max_candidate_rows <= DRIVER_RANK_MAX_ROWS
    ):
        # driver-side rank over the (provably small) candidate set: same
        # row_number() over (order_key desc, doc_id asc) per query_id.
        # `scored` arrives as plain rows from the local fast path, or is
        # collected from the cogroup output when the bound is small.
        import math as _math

        cand = scored if isinstance(scored, list) else scored.collect()
        by_q: dict[int, list] = {}
        for r in cand:
            by_q.setdefault(int(r["query_id"]), []).append(r)
        top_rows = []
        for qid in by_q:
            if fixed_point:
                keyf = lambda r: (  # noqa: E731
                    -_math.floor(r["score"] * 1_000_000),
                    int(r["doc_id"]),
                )
            else:
                keyf = lambda r: (-r["score"], int(r["doc_id"]))  # noqa: E731
            ranked = sorted(by_q[qid], key=keyf)
            for rank0, r in enumerate(ranked[offset : offset + k]):
                top_rows.append(
                    {
                        "query_id": qid,
                        "doc_id": int(r["doc_id"]),
                        "score": r["score"],
                        "rank": offset + rank0 + 1,
                    }
                )
    else:
        if fixed_point:
            # Rank over the FLOORED score (CLAUDE.md invariant: the DuckDB
            # oracle ranks floor(score*1e6) with doc_id tie-break).
            order_key = F.floor(F.col("score") * 1_000_000).cast("long")
        else:
            order_key = F.col("score")
        w = Window.partitionBy("query_id").orderBy(
            F.desc(order_key), F.asc("doc_id")
        )
        top_rows = (
            scored.withColumn("rank", F.row_number().over(w))
            .filter((F.col("rank") > offset) & (F.col("rank") <= offset + k))
            .collect()
        )
    if not top_rows:
        return empty

    # URL lookup for the (<= queries x k) winners only: derive each docID's
    # (part_id, local_pos) from the grid, then read JUST those partitions
    # with both predicates pushed to parquet — at 10^12 docs this touches a
    # handful of files instead of scanning the corpus.
    grid = se.grid_parts
    want: dict[int, tuple[int, int]] = {}
    for r in top_rows:
        did = int(r["doc_id"])
        pid = int(np.searchsorted(grid, did, side="right") - 1)
        want[did] = (pid, did - int(grid[pid]))
    parts = sorted({p for p, _ in want.values()})
    poss = sorted({lp for _, lp in want.values()})
    # r6: the winners' url/text fetch is a DRIVER-SIDE pyarrow read of just
    # the winners' part_id partition dirs with the local_pos predicate
    # pushed to parquet row groups — the rows were always collected to the
    # driver to assemble the result anyway, and the read touches <= queries
    # x k partitions at any corpus size. One fewer sequential Spark job per
    # query (~0.3-0.5 s fixed overhead here); any layout surprise falls
    # back to the original Spark scan (identical pruning, identical rows).
    lookup_cols = ["part_id", "local_pos", "url"] + (["text"] if with_text else [])
    url_rows: list[dict] | None = None
    try:
        url_rows = []
        for p in parts:
            for r in _pruned_parquet_rows(
                paths.docs_extracted,
                [f"part_id={p}"],
                lookup_cols[1:],
                filters=[("local_pos", "in", poss)],
            ):
                r["part_id"] = p
                url_rows.append(r)
    except Exception:
        url_rows = None
    if url_rows is None:
        url_rows = [
            r.asDict()
            for r in spark.read.parquet(paths.docs_extracted)
            .filter(F.col("part_id").isin(parts) & F.col("local_pos").isin(poss))
            .select(*lookup_cols)
            .collect()
        ]
    winners = {
        (int(r["part_id"]), int(r["local_pos"])): r for r in url_rows
    }
    out = []
    for r in top_rows:
        wrow = winners[want[int(r["doc_id"])]]
        rec = (int(r["query_id"]), int(r["rank"]), wrow["url"], float(r["score"]))
        out.append(rec + (wrow["text"],) if with_text else rec)
    out.sort(key=lambda x: (x[0], x[1]))
    return spark.createDataFrame(out, out_schema)


def search_query_string(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    cell_parts: int = 4,
    fixed_point: bool = False,
    with_text: bool = False,
    max_expansions: int = 64,
) -> DataFrame:
    """Lucene ``query_string`` mini-language over the committed index —
    the one-call composition of the surfaces that exist individually:
    SHOULD terms (OR, BM25-scored), ``term^w`` boosts, ``+term`` musts,
    ``-term`` boolean NOT, ``"quoted"`` required phrases (contiguous,
    in-order; terms promoted to scored musts — ``search_phrase``'s
    BM25-over-terms scoring, NOT Lucene phrase-frequency), ``-"quoted"``
    negated phrases, and ``term*`` prefix expansion. Grammar and clause
    semantics live in the shared lockstep parser
    (``functions/tokenizer.parse_query_string``) so the engine, the pytest
    oracle and the SQL twin (``driverq._query_string_sql``) parse queries
    identically. -> (query_id, rank, url, score[, text]).

    Admission is the engine-wide PRE-RANK exclusion contract: a doc ranks
    iff it matches >= 1 scored clause (inherent), contains every must term,
    matches every required phrase, and matches no negated term or phrase —
    all applied before the global rank, so survivor scores equal the plain
    OR query's scores and ranks compact. score = sum over matched scored
    terms of BM25 * weight (weights fold into idf pre-payload, the standing
    boost contract).

    Plan (three kernel calls + the shared rank/lookup tail, each exact):

    1. ONE exhaustive dense kernel over every query's scored terms
       (boosts + '-term' negations ride the existing per-kernel channels)
       via ``raw_scored`` — O(matches) scored rows, the inherent cost of
       composite admission (same class as ``search_collapse``/dis_max; a
       pure term query should use ``search`` and keep BMW pruning).
    2. ONE conjunctive kernel over the must terms of queries that have
       them -> semi-join on (query_id, doc_id). A must term the index has
       never seen admits nothing — correct, the index covers the corpus.
    3. ONE conjunctive kernel with every phrase (required AND negated) as
       its own ``qid*64+i`` sub-query -> candidates = docs containing all
       the phrase's terms (a superset of its matches, and the ONLY docs
       that can match it) -> adjacency verification on their text,
       distributed and codegen'd (``_adjacency_expr``, the
       ``search_phrase`` verify stage) with the extracts scan pruned to
       the candidates' build partitions -> required phrases semi-join
       (docs matching ALL of the query's phrases), negated phrases
       anti-join. No candidate cap and no truncation: candidates flow
       distributed through joins (AQE broadcasts small sides), never
       through the driver — exact at any corpus size, at the
       O(docs containing all phrase terms) cost search_phrase's positions
       path also pays.

    Reference parity: the reference has no query language at all (its
    retrieval is an LLM prompt over the PDF tree,
    /root/reference/pageindex/page_index.py); this surface is the Lucene/
    Elasticsearch ``query_string`` shape the north rule's engine class
    requires, lowered onto the committed-index kernels.
    """
    from ..functions.sqlglue import spark_terms
    from ..functions.tokenizer import parse_query_string

    se = get_searcher(spark, index_dir, cell_parts)
    parsed = {qid: parse_query_string(text) for qid, text in queries}
    if len(parsed) != len(queries):
        raise ValueError("duplicate query_id in batch")

    # prefix expansion: one term-dictionary scan for every stem in the batch
    stems = sorted({s for p in parsed.values() for s in p["prefixes"]})
    exp = _expand_prefixes(se, stems, max_expansions) if stems else {}
    full_w: dict[int, dict[str, float]] = {}
    for qid, p in parsed.items():
        w = dict(p["weights"])
        for s in p["prefixes"]:
            for t in exp.get(s, []):
                w.setdefault(t, 1.0)  # explicit clause keeps its weight
        full_w[qid] = w

    out_schema = "query_id int, rank int, url string, score double" + (
        ", text string" if with_text else ""
    )
    empty = spark.createDataFrame([], out_schema)

    def _boost_word(t: str, w: float) -> str:
        if w == 1.0:
            return t
        s = repr(w)
        if not _QS_WEIGHT_RE.match(s):
            raise ValueError(f"weight {w!r} not representable as 'term^w'")
        return f"{t}^{s}"

    main_q = [
        (
            qid,
            " ".join(
                [_boost_word(t, w) for t, w in sorted(full_w[qid].items())]
                + [f"-{t}" for t in parsed[qid]["neg"]]
            ),
        )
        for qid in sorted(parsed)
        if full_w[qid]  # a query whose prefixes all expanded to nothing
    ]
    if not main_q:
        return empty
    scored, _parts = _search_impl(
        se, main_q, k, "dense", fixed_point=fixed_point, raw_scored=True
    )

    # must admission (step 2)
    must_q = [
        (qid, " ".join(parsed[qid]["must"]))
        for qid, _t in main_q
        if parsed[qid]["must"]
    ]
    if must_q:
        conj, _ = _search_impl(
            se, must_q, k, "conjunctive", fixed_point=fixed_point,
            raw_scored=True,
        )
        # single-lineage admission (no filter/union fork re-executing the
        # kernel subtree): conjunctive rows are unique per (query, doc) —
        # cells partition docID space — so a left join never duplicates.
        mq = [qid for qid, _t in must_q]
        scored = (
            scored.join(
                conj.select("query_id", "doc_id").withColumn(
                    "__m", F.lit(1)
                ),
                ["query_id", "doc_id"],
                "left",
            )
            .filter(
                F.col("__m").isNotNull() | ~F.col("query_id").isin(mq)
            )
            .drop("__m")
        )

    # phrase admission (step 3)
    phr_sub: list[tuple[int, str]] = []
    sub_meta: list[tuple[int, int, bool, list[str]]] = []  # sub, qid, is_req
    req_counts: dict[int, int] = {}
    for qid, _t in main_q:
        p = parsed[qid]
        ph, nph = p["phrases"], p["neg_phrases"]
        if len(ph) + len(nph) > 63:
            raise ValueError(f"query {qid}: more than 63 phrase clauses")
        for i, terms in enumerate(ph + nph):
            phr_sub.append((qid * 64 + i, " ".join(terms)))
            sub_meta.append((qid * 64 + i, qid, i < len(ph), terms))
        if ph:
            req_counts[qid] = len(ph)
    if phr_sub:
        cand, cparts = _search_impl(
            se, phr_sub, k, "conjunctive", fixed_point=fixed_point,
            raw_scored=True,
        )
        ext = spark.read.parquet(se.paths.docs_extracted).select(
            F.col("part_id").cast("int").alias("part_id"), "local_pos", "text"
        )
        if cparts is not None and 2 * len(cparts) < len(se.grid_parts):
            ext = ext.filter(F.col("part_id").isin(sorted(cparts)))
        cond = F.lit(False)
        for sub, _qid, _is_req, terms in sub_meta:
            cond = F.when(
                F.col("query_id") == sub,
                _adjacency_expr("tk", terms, 0, True),
            ).otherwise(cond)
        meta = spark.createDataFrame(
            [(s, q, r) for s, q, r, _t in sub_meta],
            "sub int, qid int, is_req boolean",
        )
        # ONE aggregation over the verify output (single lineage — the
        # conjunctive kernel + text verify run once, not once per clause
        # kind): per (query, doc), how many distinct required phrases
        # matched and whether any negated phrase did. verified rows are
        # unique per (sub, doc) — cand is (cells partition docID space)
        # and (part_id, local_pos) is the extract's primary key.
        ver_agg = (
            cand.join(ext, ["part_id", "local_pos"])
            .withColumn("tk", F.expr(spark_terms("text")))
            .filter(cond)
            .join(F.broadcast(meta), F.col("query_id") == F.col("sub"))
            .groupBy(F.col("qid").alias("query_id"), "doc_id")
            .agg(
                F.sum(F.when(F.col("is_req"), 1).otherwise(0)).alias(
                    "__n_ok"
                ),
                F.max(F.when(~F.col("is_req"), 1).otherwise(0)).alias(
                    "__n_neg"
                ),
            )
        )
        need = spark.createDataFrame(
            list(req_counts.items()) or [(-1, 0)],
            "query_id int, __n_req int",
        )
        scored = (
            scored.join(ver_agg, ["query_id", "doc_id"], "left")
            .join(F.broadcast(need), "query_id", "left")
            .filter(
                (
                    F.col("__n_req").isNull()
                    | (
                        F.coalesce(F.col("__n_ok"), F.lit(0))
                        == F.col("__n_req")
                    )
                )
                & (F.coalesce(F.col("__n_neg"), F.lit(0)) == 0)
            )
            .drop("__n_ok", "__n_neg", "__n_req")
        )

    return _rank_and_lookup(
        se,
        scored.select("query_id", "doc_id", "score"),
        k,
        fixed_point,
        with_text,
        empty,
    )


_QS_WEIGHT_RE = re.compile(r"^\d+(?:\.\d+)?$")
