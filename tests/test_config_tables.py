"""Config loader (unknown-key rejection, reference utils parity) and the
Iceberg/parquet storage branch."""

import json

import pytest

from pageindex_spark.config import BuildConfig, load_config
from pageindex_spark.sources.tables import iceberg_available, write_bucketed_index


def test_load_config_defaults_and_merge(tmp_path):
    assert load_config() == BuildConfig()
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"n_buckets": 8, "fold_light": False}))
    cfg = load_config({"n_seg_chunks": 2}, path=str(p))
    assert (cfg.n_buckets, cfg.fold_light, cfg.n_seg_chunks) == (8, False, 2)
    # None overrides mean "not set" and never shadow file values
    cfg2 = load_config({"n_buckets": None}, path=str(p))
    assert cfg2.n_buckets == 8


def test_load_config_rejects_unknown_keys(tmp_path):
    with pytest.raises(ValueError, match="unknown config key.*nbuckets"):
        load_config({"nbuckets": 8})
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"target_runbytes": 1}))
    with pytest.raises(ValueError, match="config file"):
        load_config(path=str(p))
    p.write_text(json.dumps([1, 2]))
    with pytest.raises(ValueError, match="JSON object"):
        load_config(path=str(p))


def test_write_bucketed_index_parquet_shim(spark, tmp_path):
    from pageindex_spark.operators.compaction import with_term_bucket

    df = with_term_bucket(
        spark.createDataFrame([("alpha", 1), ("beta", 2)], "term string, run_id long"),
        n_buckets=4,
    )
    out = str(tmp_path / "idx")
    assert write_bucketed_index(df, out, spark, 4) == "parquet"
    back = spark.read.parquet(out)
    assert back.count() == 2 and "bucket" in back.columns


def test_write_bucketed_index_iceberg(spark, tmp_path):
    """Gated on runtime availability (jars unavailable offline in this
    sandbox): skipped-not-dead; the branch runs the day the jars exist."""
    if not iceberg_available(spark):
        pytest.skip("Iceberg runtime not on the classpath (offline sandbox)")
    df = spark.createDataFrame([("alpha", 1)], "term string, run_id long")
    assert write_bucketed_index(df, "", spark, 4, table="local.db.idx") == "iceberg"


def test_iceberg_chunked_writes_keep_all_chunks(spark):
    """ADVICE r3 high: with the table partitioned by Iceberg's own
    bucket(B, term) transform (murmur3 seed 0), chunk rows — grouped by the
    ENGINE's Spark-hash bucket — scattered across nearly every physical
    partition, so chunk k's overwritePartitions() deleted chunk k-1's rows.
    Identity partitioning on the engine bucket makes chunks disjoint; both
    chunks' terms must survive a 2-chunk write sequence."""
    from pyspark.sql import functions as F

    from pageindex_spark.operators.compaction import with_term_bucket
    from pageindex_spark.sources.tables import read_index_runs

    if not iceberg_available(spark):
        pytest.skip("Iceberg runtime not on the classpath (offline sandbox)")
    n_buckets, n_chunks, table = 4, 2, "local.db.idx_chunks"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    terms = [(f"term{i:03d}", i) for i in range(40)]
    df = with_term_bucket(
        spark.createDataFrame(terms, "term string, run_id long"), n_buckets
    )
    for chunk in range(n_chunks):
        part = df.filter(F.col("bucket") % n_chunks == chunk)
        assert part.count() > 0, "degenerate fixture: empty chunk"
        write_bucketed_index(part, "", spark, n_buckets, table=table)
    back = read_index_runs(spark, "", n_buckets, table=table)
    assert sorted(r["term"] for r in back.select("term").collect()) == sorted(
        t for t, _ in terms
    )
