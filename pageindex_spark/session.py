"""SparkSession factory tuned for the engine.

Local mode in the sandbox; on a real cluster the same configs apply except
master/memory come from spark-submit. AQE stays on (runtime shuffle sizing,
skew-join splitting); Arrow transport on (all our Python stages are
Arrow-batched); shuffle partitions sized to cores locally — on a 1000-executor
cluster this would be set to ~2-3x total cores via --conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pageindex_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "48g",
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def warm_up(spark: SparkSession) -> None:
    """One-time JVM/JIT warm-up of the hot expression paths.

    Measured in this sandbox: the first job evaluating the tokenizer regex
    pays ~20-30s of JIT compilation, after which the same expression runs in
    <1s. Benchmarks call this before the timed region so measurements reflect
    steady-state throughput (on a long-lived cluster the cost amortizes to
    zero anyway).
    """
    from pyspark.sql import functions as F

    from .functions.sqlglue import spark_term_count, spark_terms

    (
        spark.range(3000)
        .select(F.repeat(F.lit("ab cd9 "), 400).alias("text"))
        .select(
            F.size(F.expr(spark_terms("text"))).alias("l"),
            F.expr(spark_term_count("text")).alias("c"),
        )
        .agg(F.avg("l"), F.avg("c"))
        .collect()
    )
