"""Storage layer: Iceberg if the runtime resolves, else parquet shim.

SURVEY.md §7(c): the sandbox has no network, so
``org.apache.iceberg:iceberg-spark-runtime`` cannot be fetched; the engine
therefore writes the SAME layout (partition transforms included) to plain
parquet and records the substitution in the index metadata + BENCH/BASELINE.
On a real cluster, pass ``storage="iceberg"`` and the writes switch to
``writeTo(...).using("iceberg")`` partitioned by IDENTITY on the engine's
term-bucket column, with snapshot commits; resume then keys off Iceberg
snapshot metadata instead of the manifest parquet.
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
    ``writeTo(table).partitionedBy(F.col("bucket"))`` — identity partition
    on the engine's precomputed term bucket, with a snapshot commit; resume
    can key off snapshot metadata. The sandbox has no jars (offline), so
    the shim writes the SAME layout to plain parquet
    (``partitionBy("bucket")``). Both layouts prune query reads to the
    query terms' buckets via the driver-side ``functions.murmur3`` filter.

    Chunked/resumed builds call this once per bucket chunk (ADVICE r2):
    ``createOrReplace`` per chunk would wipe previously committed chunks, so
    the table is created only when absent; subsequent chunks use
    ``overwritePartitions`` (dynamic overwrite — replaces exactly the
    partitions present in the chunk, idempotent on resume), mirroring the
    parquet shim's ``partitionOverwriteMode=dynamic`` overwrite.

    The Iceberg table partitions by IDENTITY on the engine's precomputed
    ``bucket`` column, NOT by Iceberg's hidden ``bucket(B, term)`` transform
    (ADVICE r3 high): chunk membership is ``engine_bucket % n_chunks``, and
    Iceberg's own bucket transform hashes term with a DIFFERENT murmur3
    seed, so under the transform a chunk's rows would scatter across nearly
    every physical partition and each chunk's ``overwritePartitions`` would
    dynamically delete the previous chunk's committed rows. Identity on the
    engine bucket makes chunks own disjoint partition sets (idempotent
    resume, chunk-safe), keeps the driver-side murmur3 pruning filter
    aligned with the physical layout, and still prunes scans to the query
    terms' buckets.
    """
    if table and iceberg_available(spark):
        from pyspark.sql import functions as F

        w = df.writeTo(table)
        if spark.catalog.tableExists(table):
            w.overwritePartitions()
        else:
            w.using("iceberg").partitionedBy(F.col("bucket")).create()
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


def read_index_runs(
    spark: SparkSession,
    path: str,
    n_buckets: int,
    table: str | None = None,
) -> DataFrame:
    """Read committed index runs through the SAME storage branch they were
    written with (ADVICE r2: an Iceberg-enabled build previously wrote to the
    table but every downstream read still hit the never-written parquet
    path). The Iceberg table stores the engine's ``bucket`` column as its
    identity partition (see ``write_bucketed_index``), so both branches
    return the same schema and a ``bucket`` predicate partition-prunes in
    both."""
    if table and iceberg_available(spark):
        return spark.read.table(table)
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
