"""Storage layer: Iceberg if the runtime resolves, else parquet shim.

SURVEY.md §7(c): the sandbox has no network, so
``org.apache.iceberg:iceberg-spark-runtime`` cannot be fetched; the engine
therefore writes the SAME layout (partition transforms included) to plain
parquet and records the substitution in the index metadata + BENCH/BASELINE.
On a real cluster, pass ``storage="iceberg"`` and the writes switch to
``writeTo(...).using("iceberg")`` with ``bucket(B, term)`` partitioning and
snapshot commits; resume then keys off Iceberg snapshot metadata instead of
the manifest parquet.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def write_bucketed_index(
    df: DataFrame,
    path: str,
    spark: SparkSession,
    n_buckets: int,
    table: str | None = None,
) -> str:
    """Write index runs partitioned by term bucket; returns the storage used.

    Iceberg branch (north rule names Iceberg): when a catalog table name is
    given AND the Iceberg runtime resolves, write via
    ``writeTo(table).partitionedBy(bucket(B, term))`` — Iceberg computes the
    bucket transform itself, commits a snapshot, and resume can key off
    snapshot metadata. The sandbox has no jars (offline), so the shim writes
    the SAME layout to parquet using the precomputed ``bucket`` column
    (``compaction.with_term_bucket`` — Spark-hash, matched driver-side by
    ``functions.murmur3`` for pruning). Both layouts prune query reads to
    the query terms' buckets.
    """
    if table and iceberg_available(spark):
        from pyspark.sql import functions as F

        (
            df.drop("bucket")
            .writeTo(table)
            .using("iceberg")
            .partitionedBy(F.bucket(n_buckets, F.col("term")))
            .createOrReplace()
        )
        return "iceberg"
    df.write.mode("overwrite").partitionBy("bucket").parquet(path)
    return "parquet"


def write_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def append_table(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    write_table(df, path, partition_by, mode="append")


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_meta(index_dir: str, meta: dict) -> None:
    os.makedirs(index_dir, exist_ok=True)
    tmp = os.path.join(index_dir, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)
    os.replace(tmp, os.path.join(index_dir, "meta.json"))


def read_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "meta.json")) as f:
        return json.load(f)
