"""Segment compaction: hash(term, salt) shuffle + streaming merge into
index runs.

Build step 4-5 (SURVEY.md §7). Reference parity: the reference's only
"merge" is the stateful TOC fold across page groups
(``/root/reference/pageindex/page_index.py:579-581``); here it becomes the
classic SPIMI merge, made shuffle- and skew-aware per the north rule.

Skew design (the part AQE cannot do for a groupBy — SURVEY.md §4.2-3):

* **Structural salting.** The shuffle key is ``(term, salt_group)`` with
  ``salt_group = part_id // parts_per_group`` — contiguous docID ranges.
  A heavy hitter ("the", df ~= corpus size) therefore spreads over
  P / parts_per_group reducers instead of melting one; no detection pass,
  no size-estimation join, decisions are fully local. Light terms compact
  ``parts_per_group`` segments into one run.
* **Local greedy packing.** Within a group, segments merge in docID order
  but flush at ``target_run_bytes`` — heavy groups legitimately emit
  several runs. Merge itself is pure blob concatenation
  (``runfmt.concat_runs``): zero decode, zero re-encode.
* **Streaming execution.** One ``repartition(term, salt_group)`` +
  ``sortWithinPartitions`` + ``mapInArrow`` — one Python invocation per
  shuffle partition (NOT per group; a per-group applyInPandas pays ~1ms
  of pandas overhead x millions of terms).

The final index keeps (term, run_id) rows — heavy terms have multiple runs
(disjoint docID ranges, sorted), which query-time WAND treats as one
logical posting list. ``df`` per term is the metadata-only sum of run
``n_docs``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .runfmt import Run, concat_runs, mask_run, split_run

# Target compressed bytes per merged run; bounds reducer memory and the
# maximum single-task work unit at any corpus size.
TARGET_RUN_BYTES = 8 * 1024 * 1024
PARTS_PER_GROUP = 8

# n_bytes (compressed posting bytes of the run) makes downstream size
# decisions a column-pruned metadata read — the second-level fold pass sizes
# every term WITHOUT touching blob columns.
INDEX_SCHEMA = (
    "term string, run_id long, first_doc long, last_doc long, n_docs long, "
    "n_bytes long, "
    "doc_blob binary, tf_blob binary, bm_last array<long>, bm_maxq array<double>, "
    "bm_doc_off array<int>, bm_tf_off array<int>, bm_ndocs array<int>"
)

_INDEX_PA = pa.schema(
    [
        pa.field("term", pa.string()),
        pa.field("run_id", pa.int64()),
        pa.field("first_doc", pa.int64()),
        pa.field("last_doc", pa.int64()),
        pa.field("n_docs", pa.int64()),
        pa.field("n_bytes", pa.int64()),
        pa.field("doc_blob", pa.binary()),
        pa.field("tf_blob", pa.binary()),
        pa.field("bm_last", pa.list_(pa.int64())),
        pa.field("bm_maxq", pa.list_(pa.float64())),
        pa.field("bm_doc_off", pa.list_(pa.int32())),
        pa.field("bm_tf_off", pa.list_(pa.int32())),
        pa.field("bm_ndocs", pa.list_(pa.int32())),
    ]
)


def run_from_row(row) -> Run:
    """Rehydrate a Run from a Spark/pandas row (dict-like access)."""
    return Run(
        first_doc=int(row["first_doc"]),
        last_doc=int(row["last_doc"]),
        n_docs=int(row["n_docs"]),
        doc_blob=bytes(row["doc_blob"]),
        tf_blob=bytes(row["tf_blob"]),
        bm_last=np.asarray(row["bm_last"], dtype=np.int64),
        bm_maxq=np.asarray(row["bm_maxq"], dtype=np.float64),
        bm_doc_off=np.asarray(row["bm_doc_off"], dtype=np.int32),
        bm_tf_off=np.asarray(row["bm_tf_off"], dtype=np.int32),
        bm_ndocs=np.asarray(row["bm_ndocs"], dtype=np.int32),
    )


def _run_cols(term: str, run_id: int, r: Run, out: dict) -> None:
    out["term"].append(term)
    out["run_id"].append(run_id)
    out["first_doc"].append(r.first_doc)
    out["last_doc"].append(r.last_doc)
    out["n_docs"].append(r.n_docs)
    out["n_bytes"].append(len(r.doc_blob) + len(r.tf_blob))
    out["doc_blob"].append(r.doc_blob)
    out["tf_blob"].append(r.tf_blob)
    out["bm_last"].append(r.bm_last.tolist())
    out["bm_maxq"].append(r.bm_maxq.tolist())
    out["bm_doc_off"].append(r.bm_doc_off.tolist())
    out["bm_tf_off"].append(r.bm_tf_off.tolist())
    out["bm_ndocs"].append(r.bm_ndocs.tolist())


def compact_segments(
    segments: DataFrame,
    target_run_bytes: int = TARGET_RUN_BYTES,
    parts_per_group: int = PARTS_PER_GROUP,
) -> DataFrame:
    """segments (term, seg_id=part_id, run cols) -> index runs."""
    grouped = segments.withColumn(
        "salt_group", (F.col("seg_id") / parts_per_group).cast("int")
    )
    shuffled = grouped.repartition("term", "salt_group").sortWithinPartitions(
        "term", "salt_group", "first_doc"
    )

    run_cols = (
        "first_doc", "last_doc", "n_docs", "doc_blob", "tf_blob",
        "bm_last", "bm_maxq", "bm_doc_off", "bm_tf_off", "bm_ndocs",
    )
    # Output buffer flush thresholds: row count OR accumulated blob bytes —
    # heavy-term runs are target_run_bytes each, so a row-count-only flush
    # could hold rows x 8 MB before emitting.
    flush_rows = 2048
    flush_bytes = 8 * target_run_bytes

    def merge_stream(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        """Streaming group merge with carry-over at Arrow-batch boundaries.

        The shuffle sort guarantees (term, salt_group) groups arrive
        contiguously, so one open group of pending Runs is the only state
        carried across batches — peak memory is O(target_run_bytes + one
        input batch + output buffer), NOT O(shuffle partition) (round-1
        materialized the whole partition: the first OOM at 100x scale).
        """
        out: dict[str, list] = {n2: [] for n2 in _INDEX_PA.names}
        out_bytes = 0
        cur: tuple | None = None  # open group key (term, salt_group)
        pend: list[Run] = []
        pend_bytes = 0
        emitted = 0

        def close_group():
            nonlocal pend, pend_bytes, emitted, out_bytes
            if pend:
                r = concat_runs(pend)
                _run_cols(cur[0], (int(cur[1]) << 16) | emitted, r, out)
                out_bytes += len(r.doc_blob) + len(r.tf_blob)
            pend, pend_bytes, emitted = [], 0, 0

        for batch in batches:
            terms = batch.column("term").to_pylist()
            salts = batch.column("salt_group").to_numpy(zero_copy_only=False)
            cols = {name: batch.column(name).to_pylist() for name in run_cols}
            for r_idx in range(batch.num_rows):
                key = (terms[r_idx], int(salts[r_idx]))
                if key != cur:
                    close_group()
                    cur = key
                raw = run_from_row({k: cols[k][r_idx] for k in cols})
                # An input run can exceed the target on its own (one giant
                # per-partition posting list); split it at block boundaries
                # so no committed run ever exceeds ~target (SURVEY §2.1 #38
                # large-node re-split — pure byte slicing, runfmt.split_run).
                for run in split_run(raw, target_run_bytes):
                    rb = len(run.doc_blob) + len(run.tf_blob)
                    if pend and pend_bytes + rb > target_run_bytes:
                        r = concat_runs(pend)
                        _run_cols(cur[0], (int(cur[1]) << 16) | emitted, r, out)
                        out_bytes += len(r.doc_blob) + len(r.tf_blob)
                        emitted += 1
                        pend, pend_bytes = [], 0
                    pend.append(run)
                    pend_bytes += rb
                if len(out["term"]) >= flush_rows or out_bytes >= flush_bytes:
                    yield from pa.table(out, schema=_INDEX_PA).to_batches()
                    out = {n2: [] for n2 in _INDEX_PA.names}
                    out_bytes = 0
        close_group()
        if out["term"]:
            yield from pa.table(out, schema=_INDEX_PA).to_batches()

    return shuffled.mapInArrow(merge_stream, schema=INDEX_SCHEMA)


def fold_light_runs(
    index_runs: DataFrame, target_run_bytes: int = TARGET_RUN_BYTES
) -> DataFrame:
    """Second-level compaction: fold a LIGHT term's per-salt-group runs into
    one run (VERDICT r1 #8).

    Structural salting gives every corpus-wide term ~P/parts_per_group runs
    regardless of size; at P=10^5 partitions a mid-frequency term drags
    ~12.5k run rows through every query-time read. This pass rewrites terms
    whose TOTAL posting bytes fit one target run (and that have > 1 run)
    into a single run — the long tail collapses to 1 run/term while heavy
    hitters keep their salted layout (folding them would re-melt the skew
    the salt defused).

    Scale shape (VERDICT r2 'what's wrong' #2): the light/heavy split is
    decided from a column-pruned (term, n_bytes) read — no blob IO — and the
    routing joins BROADCAST the **heavy**-term set, never the light one.
    The heavy set is small by construction: a term is heavy only when its
    total posting bytes exceed ``target_run_bytes``, so |heavy| <=
    total_index_bytes / target_run_bytes (in practice the Zipf head — a few
    thousand terms; if it ever neared the broadcast limit, raise the
    target). Broadcasting the LIGHT set (~the whole vocabulary) would fall
    back to a shuffle join keyed on bare ``term`` over blob-carrying rows —
    re-melting exactly the heavy-hitter skew the salted level-1 merge
    defused (a heavy term's ~P/8 runs x 8 MB landing on ONE reducer).
    With the broadcast-heavy routing, both branches are map-side; only
    light-term blobs shuffle (each term <= target_run_bytes total, so
    reducers are skew-free by definition); heavy runs pass through
    untouched. Merge is the same zero-decode blob concat as level 1. Runs
    within a term stay disjoint docID ranges in first_doc order, so
    query-time semantics are unchanged. Plan shape is pinned by
    ``tests/test_plans.py::test_fold_routing_broadcasts_heavy_set``.

    Single-run light terms also flow through the fold (identity concat,
    run_id -> 0): distinguishing them would require joining on the huge
    not-heavy set. Their blobs are tiny (rare terms) and the rewrite is
    byte-identical, so the extra shuffle volume is bounded and skew-free.
    """
    sizes = index_runs.groupBy("term").agg(F.sum("n_bytes").alias("_tb"))
    heavy_terms = sizes.filter(F.col("_tb") > target_run_bytes).select("term")
    heavy = index_runs.join(F.broadcast(heavy_terms), "term", "inner")
    light = index_runs.join(F.broadcast(heavy_terms), "term", "left_anti")
    shuffled = light.repartition("term").sortWithinPartitions("term", "first_doc")

    run_cols = (
        "first_doc", "last_doc", "n_docs", "doc_blob", "tf_blob",
        "bm_last", "bm_maxq", "bm_doc_off", "bm_tf_off", "bm_ndocs",
    )

    # Output flush on rows OR bytes (ADVICE r2): a partition of light terms
    # each near target_run_bytes could otherwise buffer 2048 x 8 MB.
    flush_rows = 2048
    flush_bytes = 8 * target_run_bytes

    def fold_stream(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        out: dict[str, list] = {n2: [] for n2 in _INDEX_PA.names}
        out_bytes = 0
        cur: str | None = None
        pend: list[Run] = []

        def close_group():
            nonlocal pend, out_bytes
            if pend:
                r = concat_runs(pend)
                _run_cols(cur, 0, r, out)
                out_bytes += len(r.doc_blob) + len(r.tf_blob)
            pend = []

        for batch in batches:
            terms = batch.column("term").to_pylist()
            cols = {name: batch.column(name).to_pylist() for name in run_cols}
            for r_idx in range(batch.num_rows):
                if terms[r_idx] != cur:
                    close_group()
                    cur = terms[r_idx]
                pend.append(run_from_row({k: cols[k][r_idx] for k in cols}))
                if len(out["term"]) >= flush_rows or out_bytes >= flush_bytes:
                    yield from pa.table(out, schema=_INDEX_PA).to_batches()
                    out = {n2: [] for n2 in _INDEX_PA.names}
                    out_bytes = 0
        close_group()
        if out["term"]:
            yield from pa.table(out, schema=_INDEX_PA).to_batches()

    folded = shuffled.select(*_INDEX_PA.names).mapInArrow(
        fold_stream, schema=INDEX_SCHEMA
    )
    return heavy.select(*_INDEX_PA.names).unionByName(folded)


def term_stats_from_runs(index_runs: DataFrame) -> DataFrame:
    """(term, df) from run metadata only (no blob decode; runs are disjoint)."""
    return index_runs.groupBy("term").agg(F.sum("n_docs").alias("df"))


def heavy_hitters(segments: DataFrame, top_n: int = 20) -> DataFrame:
    """Diagnostic: biggest terms by total posting bytes (metadata-only agg)."""
    return (
        segments.groupBy("term")
        .agg(
            F.sum(F.length("doc_blob") + F.length("tf_blob")).alias("bytes"),
            F.sum("n_docs").alias("df"),
        )
        .orderBy(F.desc("bytes"), "term")
        .limit(top_n)
    )


def with_term_bucket(df: DataFrame, n_buckets: int) -> DataFrame:
    """Partition-pruning column for the index sink: murmur3 hash bucket of
    term. Query-time readers filter bucket IN (...) -> directory pruning."""
    return df.withColumn("bucket", F.pmod(F.hash("term"), F.lit(n_buckets)))


def mask_deleted_runs(runs: DataFrame, deleted_sorted) -> DataFrame:
    """Physically remove tombstoned docIDs from a runs relation (Lucene
    "expunge deletes" — ``plans/deletes.py`` holds the tombstone
    lifecycle). MAP-ONLY: no shuffle at any corpus size — each task
    rewrites its own runs, and the per-batch fast path is a vectorized
    range check (searchsorted of the sorted deleted set against the
    first_doc/last_doc metadata columns), so batches whose runs contain no
    deleted docID pass through as UNTOUCHED Arrow buffers (zero decode,
    zero Python-per-row). Only intersecting runs pay ``mask_run``'s
    affected-block decode+re-encode. Runs whose postings all die drop out;
    ``term_stats`` must be recomputed downstream (df shrinks — that is the
    exactness the expunge buys).
    """
    spark = runs.sparkSession
    dead = np.asarray(deleted_sorted, dtype=np.int64)
    bc = spark.sparkContext.broadcast(dead)

    cols = [f.name for f in _INDEX_PA]

    def rewrite(batches):
        d = bc.value
        for batch in batches:
            batch = batch.select(cols)
            first = batch.column("first_doc").to_numpy(zero_copy_only=False)
            last = batch.column("last_doc").to_numpy(zero_copy_only=False)
            touched = np.searchsorted(d, first, side="left") < np.searchsorted(
                d, last, side="right"
            )
            if not touched.any():
                yield batch
                continue
            clean = batch.filter(pa.array(~touched))
            if clean.num_rows:
                yield clean
            out = {k: [] for k in cols}
            sub = batch.filter(pa.array(touched)).to_pylist()
            for row in sub:
                masked = mask_run(run_from_row(row), d)
                if masked is not None:
                    _run_cols(row["term"], row["run_id"], masked, out)
            if out["term"]:
                yield from pa.table(out, schema=_INDEX_PA).to_batches()

    return runs.select(cols).mapInArrow(rewrite, schema=INDEX_SCHEMA)
