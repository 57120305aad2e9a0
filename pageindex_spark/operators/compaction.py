"""Segment compaction: hash(term) shuffle + salted merge into index runs.

Build step 4-5 (SURVEY.md §7). Reference parity: the reference's only
"merge" is the stateful TOC fold across page groups
(``/root/reference/pageindex/page_index.py:579-581``); here it becomes the
classic SPIMI merge, made shuffle- and skew-aware per the north rule:

* every (term, segment) row is routed by ``hash(term, salt_group)``;
* **heavy-hitter salting**: a term whose postings exceed ``target_run_bytes``
  is split into multiple contiguous salt groups — each group merges only a
  bounded number of bytes, so the 10^12-doc posting list of "the" never
  lands on one reducer. Light terms collapse to a single run. This is
  explicit two-phase aggregation (partial per salt, final = the run set),
  mirroring Spark's own partial/final agg; AQE cannot do it for us because
  the skew is in a groupBy, not a join (SURVEY.md §4.2-3).
* groups are CONTIGUOUS in docID order (``seg_id`` order), so each merged
  run is an ordered, disjoint docID interval and the merge itself is pure
  blob concatenation (``runfmt.concat_runs`` — zero decode).

The final index keeps (term, run_id) rows — heavy terms legitimately have
multiple runs (disjoint docID ranges, sorted), which query-time WAND treats
as one logical posting list. ``df`` (document frequency) per term is the
metadata-only sum of run ``n_docs``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .runfmt import Run, concat_runs

# Target compressed bytes per merged run; bounds reducer memory and the
# maximum single-task work unit at any corpus size.
TARGET_RUN_BYTES = 8 * 1024 * 1024

INDEX_SCHEMA = (
    "term string, run_id int, first_doc long, last_doc long, n_docs long, "
    "doc_blob binary, tf_blob binary, bm_last array<long>, bm_maxq array<double>, "
    "bm_doc_off array<int>, bm_tf_off array<int>, bm_ndocs array<int>"
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


def compact_segments(
    segments: DataFrame, target_run_bytes: int = TARGET_RUN_BYTES
) -> DataFrame:
    """segments (term, seg_id, run cols) -> index runs (term, run_id, ...).

    Two window passes over METADATA columns decide the salt grouping (blob
    bytes ride along but aren't inspected), then one applyInPandas merges
    each (term, salt_group).
    """
    sized = segments.withColumn(
        "seg_bytes", (F.length("doc_blob") + F.length("tf_blob")).cast("long")
    )
    w_term = Window.partitionBy("term")
    w_order = Window.partitionBy("term").orderBy("first_doc")
    # Contiguous salt groups: cumulative bytes before this segment, integer-
    # divided by the target -> segments pack greedily into ~target-sized runs.
    grouped = (
        sized.withColumn(
            "cum_bytes",
            F.sum("seg_bytes").over(
                w_order.rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .fillna({"cum_bytes": 0})
        .withColumn(
            "salt_group", (F.col("cum_bytes") / F.lit(target_run_bytes)).cast("int")
        )
    )

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("first_doc")
        runs = [run_from_row(r) for _, r in pdf.iterrows()]
        m = concat_runs(runs)
        return pd.DataFrame(
            {
                "term": [pdf["term"].iloc[0]],
                "run_id": [int(pdf["salt_group"].iloc[0])],
                "first_doc": [m.first_doc],
                "last_doc": [m.last_doc],
                "n_docs": [m.n_docs],
                "doc_blob": [m.doc_blob],
                "tf_blob": [m.tf_blob],
                "bm_last": [m.bm_last.tolist()],
                "bm_maxq": [m.bm_maxq.tolist()],
                "bm_doc_off": [m.bm_doc_off.tolist()],
                "bm_tf_off": [m.bm_tf_off.tolist()],
                "bm_ndocs": [m.bm_ndocs.tolist()],
            }
        )

    return grouped.groupBy("term", "salt_group").applyInPandas(
        merge_group, schema=INDEX_SCHEMA
    )


def term_stats_from_runs(index_runs: DataFrame) -> DataFrame:
    """(term, df) from run metadata only (no blob decode; runs are disjoint)."""
    return index_runs.groupBy("term").agg(F.sum("n_docs").alias("df"))


def with_term_bucket(df: DataFrame, n_buckets: int) -> DataFrame:
    """Partition-pruning column for the index sink: murmur3 hash bucket of
    term. Query-time readers filter bucket IN (...) -> directory pruning."""
    return df.withColumn("bucket", F.pmod(F.hash("term"), F.lit(n_buckets)))
