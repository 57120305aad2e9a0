"""Structured Streaming ingestion: incremental corpus -> extracted docs ->
appended posting segments.

The reference is strictly batch (SURVEY.md §2: "no streaming of any kind"),
and the north rule is a batch build — this module exists because a web-scale
corpus ARRIVES incrementally (new WARC drops). Design:

* ``stream_extract``: ``readStream`` over a documents directory, the same
  deterministic extraction UDF as the batch path (byte-identity preserved),
  ``writeStream`` parquet with checkpointing — exactly-once file sink.
* ``stream_segments``: ``foreachBatch`` over micro-batches; each batch

  1. range-shuffles by url and assigns (part_id, local_pos) in ONE job via
     ``docids.add_partition_pos`` — the same multi-partition mechanism as
     the batch build (round 1 serialized every batch through a
     ``coalesce(1)`` + global window: a single-task scale-killer);
  2. derives its docID start from COMMITTED batch metadata (not a mutable
     counter file), writes segments to a ``batch=N`` subdirectory with
     overwrite, then commits ``state/batches/N.json`` atomically — a
     replayed ``foreachBatch`` (crash between write and commit) overwrites
     the same subdir with the same docIDs: idempotent, no duplicate
     postings, no docID shift;
  3. builds block-max metadata at the dl->0 upper bound (``avgdl=+inf``),
     which is a valid BM25 upper bound for ANY query-time avgdl — a stale
     per-batch avgdl hint UNDERestimates the bound once the corpus drifts
     longer, and Block-Max WAND would then skip blocks holding true top-k
     docs. Streamed runs prune slightly less than batch-built ones; a
     periodic batch compaction rebuilds tight bounds.

  Query-time WAND already treats multiple runs per term as one logical
  posting list; ``refresh_streamed_index`` folds the committed batches into
  a full queryable index (postings/term_stats/norms/meta/docs_extracted)
  that ``plans.query.Searcher`` serves unchanged — pinned rank-identical to
  a batch build by ``tests/test_streaming.py``. Global part_ids are
  ``batch_id * P + local part`` so salted compaction's salt groups never mix
  batches with interleaved docID ranges.

Tests drive it with ``trigger(availableNow=True)`` for determinism.
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.docids import (
    add_partition_pos,
    attach_doc_ids,
    offsets_from_counts,
    partition_counts,
)
from ..operators.extract import with_extracted_text
from ..operators.spimi import build_segments


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = "url string, warc_ts timestamp, html binary, lang string",
):
    """html stream -> extracted text stream (parquet sink, exactly-once)."""
    from ..functions.sqlglue import spark_terms

    raw = spark.readStream.schema(schema).parquet(input_dir)
    extracted = with_extracted_text(raw).select(
        "url",
        "text",
        F.size(F.expr(spark_terms("text"))).cast("long").alias("doc_len"),
    )
    return (
        extracted.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


# ---------------- committed-batch metadata (docID source of truth) ----------


def _batches_dir(state_dir: str) -> str:
    return os.path.join(state_dir, "batches")


def committed_batches(state_dir: str) -> dict[int, dict]:
    """batch_id -> {"start": docID, "n_docs": n} from committed metas."""
    d = _batches_dir(state_dir)
    out: dict[int, dict] = {}
    if os.path.isdir(d):
        for name in os.listdir(d):
            if name.endswith(".json"):
                with open(os.path.join(d, name)) as f:
                    out[int(name[:-5])] = json.load(f)
    return out


def _start_offset(state_dir: str, batch_id: int) -> int:
    """docID start for a batch: derived ONLY from committed batch metas.

    A replayed batch (its own meta already present) reuses its recorded
    start, so re-execution assigns identical docIDs."""
    metas = committed_batches(state_dir)
    if batch_id in metas:
        return int(metas[batch_id]["start"])
    prior = [m for b, m in metas.items() if b < batch_id]
    return max((int(m["start"]) + int(m["n_docs"]) for m in prior), default=0)


def _commit_batch(state_dir: str, batch_id: int, start: int, n_docs: int) -> None:
    d = _batches_dir(state_dir)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f"{batch_id}.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"start": start, "n_docs": n_docs}, f)
    os.replace(tmp, os.path.join(d, f"{batch_id}.json"))
    # legacy observability file: next docID after all committed batches
    nxt = max(
        (int(m["start"]) + int(m["n_docs"]) for m in committed_batches(state_dir).values()),
        default=0,
    )
    tmp2 = os.path.join(state_dir, "docid_offset.json.tmp")
    with open(tmp2, "w") as f:
        json.dump({"next_doc_id": nxt}, f)
    os.replace(tmp2, os.path.join(state_dir, "docid_offset.json"))


def _staged_extract_dir(state_dir: str, batch_id: int) -> str:
    return os.path.join(state_dir, "extracted", f"batch={batch_id}")


def segment_batch(
    batch_df: DataFrame,
    batch_id: int,
    segments_dir: str,
    state_dir: str,
    num_partitions: int | None = None,
) -> int:
    """One micro-batch -> committed segment runs; returns docs indexed.

    Idempotent by construction: docID start comes from committed metas,
    segments land in a batch-keyed subdir with overwrite, and the meta
    commit is an atomic rename — replaying the batch reproduces the same
    bytes in the same place.

    docID determinism mirrors the batch build (ADVICE r2):
    ``repartitionByRange`` re-samples its boundaries per job execution, so
    running one job to count partition sizes and a second to build segments
    over a merely-``persist()``ed shuffle can silently produce mismatched
    offsets if a cache block is lost (operators/docids.py documents the
    observed failure). The positioned rows are therefore COMMITTED to a
    batch-keyed parquet dir first (one job freezes the boundaries in files);
    counts, docIDs and segments all derive from the committed bytes. The
    staged extract doubles as the refresh's norms/doc-lookup source
    (``refresh_streamed_index``).
    """
    spark = batch_df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    from ..functions.sqlglue import spark_terms

    rows = batch_df.select("url", "text")
    staged = _staged_extract_dir(state_dir, batch_id)
    pos = add_partition_pos(rows, num_partitions).withColumn(
        "doc_len", F.size(F.expr(spark_terms("text"))).cast("long")
    )
    pos.write.mode("overwrite").partitionBy("part_id").parquet(staged)

    ext = spark.read.parquet(staged)
    counts = partition_counts(ext)
    n = sum(counts.values())
    if n == 0:
        return 0
    start = _start_offset(state_dir, batch_id)
    offsets = [start + o for o in offsets_from_counts(counts, num_partitions)]
    with_ids = attach_doc_ids(ext, offsets).withColumn(
        "part_id",
        (F.col("part_id") + F.lit(batch_id * num_partitions)).cast("int"),
    )
    # avgdl=+inf -> block-max at the dl->0 bound (see module docstring)
    segs = build_segments(with_ids, math.inf)
    segs.write.mode("overwrite").parquet(
        os.path.join(segments_dir, f"batch={batch_id}")
    )
    _commit_batch(state_dir, batch_id, start, n)
    return n


def stream_segments(
    spark: SparkSession,
    input_dir: str,
    segments_dir: str,
    state_dir: str,
    schema: str = "url string, text string",
    num_partitions: int | None = None,
):
    """Extracted-doc stream -> appended SPIMI segment runs per micro-batch."""
    raw = spark.readStream.schema(schema).parquet(input_dir)

    def per_batch(batch_df: DataFrame, batch_id: int) -> None:
        segment_batch(batch_df, batch_id, segments_dir, state_dir, num_partitions)

    return (
        raw.writeStream.foreachBatch(per_batch)
        .option("checkpointLocation", os.path.join(state_dir, "checkpoint"))
        .trigger(availableNow=True)
    )


def refresh_streamed_index(
    spark: SparkSession,
    segments_dir: str,
    state_dir: str,
    index_dir: str,
    *,
    num_partitions: int | None = None,
    n_buckets: int = 32,
    target_run_bytes: int | None = None,
    fold_light: bool = True,
) -> "IndexPaths":
    """Fold the committed ``batch=N`` segment runs into a fully queryable
    index at ``index_dir`` (VERDICT r2 missing #1: streamed segments were
    committed but nothing ever made them searchable).

    Reuses the batch build's post-extract machinery end-to-end — salted
    compaction, light-term fold, bucketed sink, norms packing — so
    ``plans.query.Searcher`` works on the result unchanged:

    * docs_extracted/: per-batch staged extracts re-keyed to GLOBAL part ids
      (``batch_id * P + local part``) — one map-only copy job, no shuffle
      (the range shuffle already happened at ingest and is frozen in the
      staged files);
    * grid: cumulative doc counts over global part ids — identical to
      ``batch start + local offset`` because batches commit consecutive
      docID ranges in batch order;
    * avgdl/n_docs: recomputed over ALL committed docs — scoring is exact;
      the streamed runs' block-max metadata stays at the ingest-time dl->0
      bound, which upper-bounds scores under ANY avgdl (module docstring),
      so Block-Max WAND remains exact, merely pruning a little less than a
      batch rebuild would.

    Idempotent wholesale: every write is an overwrite derived from committed
    inputs; re-running after a crash converges to the same bytes. Refresh is
    O(index bytes), not O(corpus): it never re-extracts or re-tokenizes.
    """
    from ..operators.codec import BLOCK_SIZE
    from ..operators.compaction import (
        TARGET_RUN_BYTES,
        compact_segments,
        fold_light_runs,
        term_stats_from_runs,
        with_term_bucket,
    )
    from ..plans.build_index import (
        FORMAT_VERSION,
        IndexPaths,
        _corpus_stats,
        write_norms,
    )
    from ..sources.tables import write_meta

    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if target_run_bytes is None:
        target_run_bytes = TARGET_RUN_BYTES
    metas = committed_batches(state_dir)
    if not metas:
        raise ValueError(f"no committed batches under {state_dir}")
    paths = IndexPaths(index_dir)
    os.makedirs(index_dir, exist_ok=True)

    # docs_extracted: staged batch extracts, part ids globalized.
    parts = []
    for b in sorted(metas):
        parts.append(
            spark.read.parquet(_staged_extract_dir(state_dir, b)).withColumn(
                "part_id",
                (F.col("part_id") + F.lit(b * num_partitions)).cast("int"),
            )
        )
    ext_all = parts[0]
    for p in parts[1:]:
        ext_all = ext_all.unionByName(p)
    (
        ext_all.select("part_id", "local_pos", "url", "text", "doc_len")
        .write.mode("overwrite")
        .partitionBy("part_id")
        .parquet(paths.docs_extracted)
    )

    from ..operators.docids import offsets_from_counts, partition_counts

    ext = spark.read.parquet(paths.docs_extracted)
    total_parts = (max(metas) + 1) * num_partitions
    offsets = offsets_from_counts(partition_counts(ext), total_parts)
    n_docs, avgdl = _corpus_stats(ext)
    write_norms(ext, offsets, paths.norms)

    # batch=N dirs surface as a partition column; drop it (seg_id is global).
    segs = spark.read.parquet(segments_dir).drop("batch")
    runs = compact_segments(segs, target_run_bytes)
    if fold_light:
        runs = fold_light_runs(runs, target_run_bytes)
    runs_b = with_term_bucket(runs, n_buckets)
    runs_b.write.mode("overwrite").partitionBy("bucket").parquet(paths.postings)
    written = spark.read.parquet(paths.postings)
    ts = with_term_bucket(term_stats_from_runs(written.drop("bucket")), n_buckets)
    ts.write.mode("overwrite").partitionBy("bucket").parquet(paths.term_stats)

    write_meta(
        index_dir,
        {
            "format_version": FORMAT_VERSION,
            "n_docs": n_docs,
            "avgdl": avgdl,
            "grid": offsets,
            "num_partitions": total_parts,
            "n_buckets": n_buckets,
            "block_size": BLOCK_SIZE,
            "target_run_bytes": target_run_bytes,
            "bm25": {"k1": 1.2, "b": 0.75},
            "storage": "parquet",
            "streamed": {"batches": sorted(metas)},
        },
    )
    return paths
