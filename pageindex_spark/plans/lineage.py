"""Per-partition checkpoint lineage + metrics (north rule: a killed build
resumes from the last committed partition; never re-extract / re-tokenize).

Reference parity: the reference's JsonLogger append-log
(``/root/reference/pageindex/utils.py:313-349``) and its memoized
continuation of truncated LLM output (``page_index.py:300-328``) are the
closest analogues; here it is a real manifest: one row per committed
(stage, partition) with docs/bytes/terms metrics (FIXTURES.md §4).

Commit protocol on the parquet shim: each chunk's data write completes
FIRST (Spark's file-commit protocol makes it all-or-nothing per write),
then the lineage rows are appended. A kill between the two leaves committed
data without lineage -> the chunk re-runs into an overwrite of the same
subdirectory (idempotent), so the invariant "lineage row => data valid"
always holds. On Iceberg both would be one snapshot commit.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = (
    "stage string, partition_id int, status string, docs long, bytes long, "
    "terms long, committed_at timestamp"
)


def lineage_path(index_dir: str) -> str:
    return os.path.join(index_dir, "_lineage")


def append_lineage(
    spark: SparkSession,
    index_dir: str,
    stage: str,
    rows: list[tuple[int, int, int, int]],  # (partition_id, docs, bytes, terms)
    committed_at: datetime | None = None,
) -> None:
    # Real commit timestamp (ADVICE r2): resume only keys off (stage,
    # partition_id, status) so a wall-clock stamp never affects determinism
    # of WHAT resumes — it only makes the manifest auditable.
    ts = committed_at or datetime.now(timezone.utc)
    data = [
        (stage, int(pid), "committed", int(docs), int(nbytes), int(terms), ts)
        for pid, docs, nbytes, terms in rows
    ]
    df = spark.createDataFrame(data, LINEAGE_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(lineage_path(index_dir))


def committed_partitions(spark: SparkSession, index_dir: str, stage: str) -> set[int]:
    path = lineage_path(index_dir)
    if not os.path.exists(path):
        return set()
    df = spark.read.parquet(path)
    rows = (
        df.filter((F.col("stage") == stage) & (F.col("status") == "committed"))
        .select("partition_id")
        .distinct()
        .collect()
    )
    return {r["partition_id"] for r in rows}


def stage_metrics(spark: SparkSession, index_dir: str) -> dict:
    path = lineage_path(index_dir)
    if not os.path.exists(path):
        return {}
    rows = (
        spark.read.parquet(path)
        .groupBy("stage")
        .agg(
            F.count("*").alias("partitions"),
            F.sum("docs").alias("docs"),
            F.sum("bytes").alias("bytes"),
            F.sum("terms").alias("terms"),
        )
        .collect()
    )
    return {
        r["stage"]: {
            "partitions": r["partitions"],
            "docs": r["docs"],
            "bytes": r["bytes"],
            "terms": r["terms"],
        }
        for r in rows
    }
