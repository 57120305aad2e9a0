"""Structured Streaming ingestion: incremental corpus -> extracted docs ->
appended posting segments.

The reference is strictly batch (SURVEY.md §2: "no streaming of any kind"),
and the north rule is a batch build — this module exists because a web-scale
corpus ARRIVES incrementally (new WARC drops). Design:

* ``stream_extract``: ``readStream`` over a documents directory, the same
  deterministic extraction UDF as the batch path (byte-identity preserved),
  ``writeStream`` parquet with checkpointing — exactly-once file sink.
* ``stream_segments``: ``foreachBatch`` assigns docIDs from a persisted
  running offset (arrival order — the streaming trade-off vs the batch
  url-sorted order, which needs a global sort no stream can do), builds
  SPIMI segments per micro-batch with the batch operators, and APPENDS
  them as new runs. Query-time WAND already treats multiple runs per term
  as one logical posting list, so appended batches are immediately
  searchable after a term_stats refresh; periodic batch compaction
  (``compaction.compact_segments``) folds small runs together.

Tests drive it with ``trigger(availableNow=True)`` for determinism.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
    raw = spark.readStream.schema(schema).parquet(input_dir)
    extracted = with_extracted_text(raw).select(
        "url",
        "text",
        F.size(F.array_remove(F.split(F.lower("text"), "[^a-z0-9]+"), ""))
        .cast("long")
        .alias("doc_len"),
    )
    return (
        extracted.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def _offset_path(state_dir: str) -> str:
    return os.path.join(state_dir, "docid_offset.json")


def _read_offset(state_dir: str) -> int:
    p = _offset_path(state_dir)
    if os.path.exists(p):
        with open(p) as f:
            return int(json.load(f)["next_doc_id"])
    return 0


def _write_offset(state_dir: str, value: int) -> None:
    os.makedirs(state_dir, exist_ok=True)
    tmp = _offset_path(state_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"next_doc_id": value}, f)
    os.replace(tmp, _offset_path(state_dir))


def stream_segments(
    spark: SparkSession,
    input_dir: str,
    segments_dir: str,
    state_dir: str,
    avgdl_hint: float,
    schema: str = "url string, text string",
):
    """Extracted-doc stream -> appended SPIMI segment runs per micro-batch.

    docIDs continue from a persisted offset (arrival order). ``avgdl_hint``
    fixes the BM25 length normalization baked into block-max metadata; a
    production deployment re-estimates it per compaction cycle (block-max is
    an upper bound, so a stale avgdl only weakens pruning, never correctness
    — scores are computed from tf + norms at query time).
    """
    raw = spark.readStream.schema(schema).parquet(input_dir)

    def per_batch(batch_df: DataFrame, batch_id: int) -> None:
        rows = batch_df.select("url", "text").orderBy("url")
        n = rows.count()
        if n == 0:
            return
        start = _read_offset(state_dir)
        with_ids = (
            rows.coalesce(1)
            .withColumn(
                "doc_id", F.row_number().over(__import__("pyspark").sql.Window.orderBy("url")) + F.lit(start - 1)
            )
            .withColumn("part_id", F.lit(batch_id).cast("int"))
        )
        segs = build_segments(with_ids, avgdl_hint)
        segs.write.mode("append").parquet(segments_dir)
        _write_offset(state_dir, start + n)

    return (
        raw.writeStream.foreachBatch(per_batch)
        .option("checkpointLocation", os.path.join(state_dir, "checkpoint"))
        .trigger(availableNow=True)
    )
