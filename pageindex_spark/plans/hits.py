"""Full-match aggregation surfaces: total hit counts and facet counts.

The reference's retrieval returns a handful of tree nodes
(/root/reference/README.md:179-188); a web-scale engine also needs the
aggregations a search UI shows NEXT to the top-k — the total hit count
("about 1,234,000 results") and per-facet match counts (Elasticsearch terms
aggregations / Lucene faceting). These aggregate the ENTIRE match set, so
they get their own plan instead of riding the top-k heap:

1. **Pruned scan + cell slicing** — identical to the search plan
   (bucket-pruned postings, map-side byte slicing; `query._slice_mapper`).
2. **Per-cell match kernel** — decode each query term's cell postings once,
   union (OR semantics), subtract tombstones and '-term' negations (the
   same pre-heap exclusion contract as search). Counting emits per-cell
   PARTIAL counts — O(cells) rows shuffle, never O(matches); faceting must
   materialize matched doc coordinates, so it emits (query_id, part_id,
   local_pos) rows — inherently O(matches), the price of the statistic.
3. **Tiny agg / dimension join** — counts: one sum per query. Facets: join
   the extracts for urls with the scan FILTERED to the matched partitions
   (partition-dir pruning, same trick as prune_norms), then join the
   caller's (url, facet) dimension and count per (query, facet value).

No norms ever shuffle (doc lengths don't matter to matching), and the
kernels share the search plan's exclusion semantics, so
``search_count(q)`` == number of docs ``search(q, k=inf)`` would rank.
Counting ships tf blobs it doesn't decode (the slice schema is shared with
scoring); a dedicated doc-only slice schema would halve count shuffle bytes
— noted, not needed until counting dominates a real workload.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.runfmt import decode_run
from ..operators.wand import assemble_cell_runs
from ..sources.tables import read_index_runs
from .query import _ensure_idf, _slice_mapper, _SLICE_DDL, get_searcher


def _match_state(se, queries: list[tuple[int, str]]):
    """Shared head for the full-match plans: parse queries ('term^w' boosts
    tolerated and ignored — weights don't change the match set; '-term'
    negations honored), resolve term presence via the Searcher's idf cache,
    and build the pruned slices DataFrame. Returns None when no query can
    match anything."""
    from ..functions.murmur3 import term_bucket
    from ..functions.tokenizer import parse_boost_query, parse_query, tokenize

    parsed = {}
    for qid, text in queries:
        txt, _w = parse_boost_query(text)
        parsed[qid] = parse_query(txt)
    qterms = {qid: sorted(set(tokenize(pos))) for qid, (pos, _) in parsed.items()}
    qneg = {qid: negs for qid, (_, negs) in parsed.items() if negs}
    terms = sorted(
        {t for ts in qterms.values() for t in ts}
        | {t for ns in qneg.values() for t in ns}
    )
    if not terms:
        return None
    _ensure_idf(se, terms)
    present = {t for t in terms if se._idf_cache[t] is not None}
    payload = [
        (qid, [t for t in qts if t in present]) for qid, qts in qterms.items()
    ]
    payload = [(qid, ts) for qid, ts in payload if ts]
    if not payload:
        return None
    neg_payload = {
        qid: [t for t in ns if t in present] for qid, ns in qneg.items()
    }
    neg_payload = {qid: ns for qid, ns in neg_payload.items() if ns}

    spark = se.spark
    bc_payload = spark.sparkContext.broadcast(payload)
    bc_neg = spark.sparkContext.broadcast(neg_payload) if neg_payload else None
    bc_deleted = (
        spark.sparkContext.broadcast(se.deleted_ids)
        if se.deleted_ids is not None and len(se.deleted_ids)
        else None
    )
    scan_terms = sorted(
        {t for _, ts in payload for t in ts}
        | {t for ns in neg_payload.values() for t in ns}
    )
    buckets = sorted({term_bucket(t, se.n_buckets) for t in scan_terms})
    runs = read_index_runs(
        spark, se.paths.postings, se.n_buckets, se.iceberg_table
    ).filter(F.col("bucket").isin(buckets) & F.col("term").isin(scan_terms))
    if se.committed_deltas is not None:
        runs = runs.filter(F.col("delta").isin(se.committed_deltas))
    bc_grid = spark.sparkContext.broadcast(se.cell_grid)
    slices = runs.drop("bucket", "run_id", "n_bytes", "delta").mapInArrow(
        _slice_mapper(bc_grid), schema=_SLICE_DDL
    )
    return bc_payload, bc_neg, bc_deleted, slices, runs


def _cell_matches(pdf: pd.DataFrame, bc_payload, bc_neg, bc_deleted):
    """(query_id -> matched docIDs) within one cell: decode each term's cell
    postings once, union per query, subtract tombstones + negations. Exact
    per cell because cells partition docID space."""
    term_runs = assemble_cell_runs(pdf)
    docs_by_term = {
        t: decode_run(r)[0].astype(np.int64) for t, r in term_runs.items()
    }
    deleted = bc_deleted.value if bc_deleted is not None else None
    negs = bc_neg.value if bc_neg is not None else {}
    out: dict[int, np.ndarray] = {}
    for qid, terms in bc_payload.value:
        arrs = [docs_by_term[t] for t in terms if t in docs_by_term]
        if not arrs:
            continue
        u = arrs[0] if len(arrs) == 1 else np.unique(np.concatenate(arrs))
        excl = [docs_by_term[t] for t in negs.get(qid, ()) if t in docs_by_term]
        if deleted is not None:
            excl.append(deleted)
        if excl:
            e = excl[0] if len(excl) == 1 else np.unique(np.concatenate(excl))
            u = u[~np.isin(u, e)]
        if len(u):
            out[qid] = u
    return out


def search_count(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str]],
    cell_parts: int = 4,
) -> DataFrame:
    """Total hit count per query -> (query_id, n_hits): the number of docs
    an unbounded ``search(q)`` would rank (OR semantics; tombstones and
    '-term' exclusions applied identically). Per-cell partial counts are
    the only shuffled rows — O(cells), never O(matches) — then one tiny
    sum. Queries with zero hits emit no row (matching the SQL twin's
    GROUP BY over matches)."""
    se = get_searcher(spark, index_dir, cell_parts)
    state = _match_state(se, queries)
    empty = spark.createDataFrame([], "query_id int, n_hits long")
    if state is None:
        return empty
    bc_payload, bc_neg, bc_deleted, slices, _runs = state

    def count_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        matches = _cell_matches(pdf, bc_payload, bc_neg, bc_deleted)
        return pd.DataFrame(
            {
                "query_id": np.array(list(matches), dtype=np.int32),
                "n": np.array([len(v) for v in matches.values()], dtype=np.int64),
            }
        )

    partial = slices.groupBy("cell").applyInPandas(
        count_cell, schema="query_id int, n long"
    )
    return partial.groupBy("query_id").agg(F.sum("n").alias("n_hits"))


def _matched_urls(spark: SparkSession, se, state) -> DataFrame:
    """Shared tail for the full-match SURFACES (facets, sort-by-field):
    the match kernel's docIDs as (query_id, part_id, url) rows. Matched
    docIDs convert to (part_id, local_pos) coordinates IN the kernel
    (broadcast grid, vectorized searchsorted), then the extracts scan is
    filtered to the partitions the matches can live in before the url join
    (partition-dir pruning — selective queries touch a handful of files)."""
    bc_payload, bc_neg, bc_deleted, slices, runs = state
    bc_parts = spark.sparkContext.broadcast(se.grid_parts)

    def match_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        grid = bc_parts.value
        matches = _cell_matches(pdf, bc_payload, bc_neg, bc_deleted)
        qids, pids, lps = [], [], []
        for qid, u in matches.items():
            pid = np.searchsorted(grid, u, side="right") - 1
            qids.append(np.full(len(u), qid, dtype=np.int32))
            pids.append(pid.astype(np.int32))
            lps.append(u - grid[pid])
        if not qids:
            return pd.DataFrame(
                {"query_id": [], "part_id": [], "local_pos": []}
            ).astype({"query_id": "int32", "part_id": "int32", "local_pos": "int64"})
        return pd.DataFrame(
            {
                "query_id": np.concatenate(qids),
                "part_id": np.concatenate(pids),
                "local_pos": np.concatenate(lps),
            }
        )

    matched = slices.groupBy("cell").applyInPandas(
        match_cell, schema="query_id int, part_id int, local_pos long"
    )
    # Prune the url lookup to partitions the matches can live in — derived
    # driver-side from the pruned RUN metadata (column-pruned, blobs never
    # load; collecting from `slices` instead would re-execute the whole
    # slicing job for a second action), the same trick as prune_norms.
    ranges = [
        (int(r["first_doc"]), int(r["last_doc"]))
        for r in runs.select("first_doc", "last_doc").collect()
    ]
    grid = se.grid_parts
    parts: set[int] = set()
    for first, last in ranges:
        p0 = int(np.searchsorted(grid, first, side="right")) - 1
        p1 = int(np.searchsorted(grid, last, side="right")) - 1
        parts.update(range(max(p0, 0), min(p1, len(grid) - 1) + 1))
    ext = spark.read.parquet(se.paths.docs_extracted).select(
        "part_id", "local_pos", "url"
    )
    if 2 * len(parts) < len(grid):
        ext = ext.filter(F.col("part_id").isin(sorted(parts)))
    return matched.join(ext, ["part_id", "local_pos"]).select(
        "query_id", "part_id", "url"
    )


def facet_counts(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str]],
    facets: DataFrame,
    cell_parts: int = 4,
) -> DataFrame:
    """Facet counts over the FULL match set -> (query_id, facet, n_docs):
    for every query, how many matching docs carry each facet value
    (Elasticsearch terms aggregation). ``facets`` is a (url, facet)
    dimension DataFrame; matched urls come from the shared
    ``_matched_urls`` tail (kernel match -> pruned url join)."""
    se = get_searcher(spark, index_dir, cell_parts)
    state = _match_state(se, queries)
    empty = spark.createDataFrame([], "query_id int, facet string, n_docs long")
    if state is None:
        return empty
    return (
        _matched_urls(spark, se, state)
        .join(facets, "url")
        .groupBy("query_id", "facet")
        .agg(F.count("*").alias("n_docs"))
    )


def range_facets(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str]],
    values: DataFrame,
    boundaries: list[float],
    cell_parts: int = 4,
) -> DataFrame:
    """Range aggregation over the FULL match set (Elasticsearch ``range`` /
    ``histogram`` aggregation) -> (query_id, bucket, n_docs): for every
    query, how many matching docs fall in each half-open interval
    [boundaries[i], boundaries[i+1]) of a numeric attribute — bucket ``i``
    is 0-indexed, values outside [boundaries[0], boundaries[-1]) drop (ES's
    bounded-ranges form; callers wanting unbounded ends add +/-inf
    boundaries). ``values`` is a (url, val) dimension DataFrame; matched
    urls come from the shared ``_matched_urls`` tail (kernel match set ->
    pruned url join, full pre-aggregation exclusion contract).

    The bucket index is computed as a SUM OF COMPARISONS —
    ``sum_i(val >= boundaries[i])`` over the interior boundaries — instead
    of a dialect function (``width_bucket`` exists in Spark but not every
    oracle engine; the comparison form is portable and whole-stage
    codegen). Aggregation is one groupBy — map-side partial counts, a few
    rows per (query, bucket) shuffle."""
    bl = [float(x) for x in boundaries]
    if len(bl) < 2 or any(a >= b for a, b in zip(bl, bl[1:])):
        raise ValueError(
            f"boundaries must be >= 2 strictly ascending values, got {boundaries}"
        )
    se = get_searcher(spark, index_dir, cell_parts)
    state = _match_state(se, queries)
    empty = spark.createDataFrame([], "query_id int, bucket int, n_docs long")
    if state is None:
        return empty
    val = F.col("val").cast("double")
    bucket = None
    for b in bl[1:-1]:
        term = F.when(val >= F.lit(b), 1).otherwise(0)
        bucket = term if bucket is None else bucket + term
    if bucket is None:
        bucket = F.lit(0)
    return (
        _matched_urls(spark, se, state)
        .join(values.select("url", "val"), "url")
        .filter((val >= F.lit(bl[0])) & (val < F.lit(bl[-1])))
        .withColumn("bucket", bucket.cast("int"))
        .groupBy("query_id", "bucket")
        .agg(F.count("*").alias("n_docs"))
    )


def search_sorted_by(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str]],
    sort_keys: DataFrame,
    k: int = 10,
    descending: bool = True,
    cell_parts: int = 4,
) -> DataFrame:
    """Sort-by-field retrieval (Elasticsearch ``sort`` on an attribute):
    the top-``k`` MATCHING docs per query ordered by an external sort key
    instead of relevance -> (query_id, rank, url, sort_key). Matching is
    the search plan's OR semantics with the full exclusion contract
    (tombstones and '-term' negations mask before anything ranks — shared
    ``_match_state`` kernels); scores are never computed and norms never
    load, exactly like ES skips scoring for field sorts. ``sort_keys`` is
    a (url, sort_key) dimension DataFrame; docs absent from it drop
    (ES's missing-value exclusion under ``unmapped_type`` strictness —
    callers wanting ES's "missing: _last" supply a defaulted dimension).

    Exactness + scale shape: the match set is inherently O(matches) rows
    (the price of a field sort over everything that matched), but the
    RANKING never sorts it globally — phase 1 takes the per-(query,
    extract-partition) top-k with a well-distributed window (the global
    top-k per query is contained in the union of per-part top-ks), phase
    2 ranks the <= queries x parts x k survivors — the same global-rank
    shape as the BM25 plan's ``_rank_and_lookup``. Ties break url-asc
    (== docID order, the engine-wide tie-break)."""
    from pyspark.sql import Window

    se = get_searcher(spark, index_dir, cell_parts)
    state = _match_state(se, queries)
    kt = sort_keys.schema["sort_key"].dataType.simpleString()
    empty = spark.createDataFrame(
        [], f"query_id int, rank int, url string, sort_key {kt}"
    )
    if state is None:
        return empty
    order = (
        F.col("sort_key").desc() if descending else F.col("sort_key").asc(),
        F.col("url").asc(),
    )
    keyed = _matched_urls(spark, se, state).join(
        sort_keys.select("url", "sort_key"), "url"
    )
    w_part = Window.partitionBy("query_id", "part_id").orderBy(*order)
    w_all = Window.partitionBy("query_id").orderBy(*order)
    return (
        keyed.withColumn("pr", F.row_number().over(w_part))
        .filter(F.col("pr") <= k)
        .withColumn("rank", F.row_number().over(w_all))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "url", "sort_key")
    )
