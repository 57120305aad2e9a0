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
  posting list, so appended batches are searchable after a term_stats
  refresh. Global part_ids are ``batch_id * P + local part`` so salted
  compaction's salt groups never mix batches with interleaved docID ranges.

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
    """
    spark = batch_df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    rows = batch_df.select("url", "text")
    pos = add_partition_pos(rows, num_partitions)
    pos.persist()
    try:
        counts = partition_counts(pos)
        n = sum(counts.values())
        if n == 0:
            return 0
        start = _start_offset(state_dir, batch_id)
        offsets = [start + o for o in offsets_from_counts(counts, num_partitions)]
        with_ids = attach_doc_ids(pos, offsets).withColumn(
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
    finally:
        pos.unpersist()


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
