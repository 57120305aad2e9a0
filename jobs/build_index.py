#!/usr/bin/env python3
"""spark-submit entry: build the inverted index over a documents table.

Cluster usage (north rule):
    zip -r pageindex_spark.zip pageindex_spark
    spark-submit --py-files pageindex_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.shuffle.partitions=<2-3x total cores> \
        jobs/build_index.py --input <iceberg-table-or-parquet-path> \
        --output /path/to/index --num-partitions <P> --buckets 256 \
        --seg-chunks 16 --bucket-chunks 16

Sandbox usage (local[N]) is identical minus the cluster confs. Re-running
after a kill resumes from the lineage manifest automatically.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet path or table of documents")
    ap.add_argument("--output", required=True, help="index directory")
    # defaults live on BuildConfig; None here means "not set on the CLI",
    # so a --config file value isn't silently shadowed by argparse defaults
    ap.add_argument("--num-partitions", type=int, default=None)
    ap.add_argument("--buckets", type=int, default=None)
    ap.add_argument("--seg-chunks", type=int, default=None)
    ap.add_argument("--bucket-chunks", type=int, default=None)
    ap.add_argument("--cores", type=int, default=None, help="local mode only")
    ap.add_argument(
        "--config",
        default=None,
        help="JSON file of BuildConfig keys; unknown keys are rejected "
        "(reference parity: pageindex utils config loader)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from pageindex_spark import build_index, build_metrics
    from pageindex_spark.config import load_config
    from pageindex_spark.session import get_spark

    cfg = load_config(
        {
            "num_partitions": args.num_partitions,
            "n_buckets": args.buckets,
            "n_seg_chunks": args.seg_chunks,
            "n_bucket_chunks": args.bucket_chunks,
        },
        path=args.config,
    )

    if SparkSession.getActiveSession() is not None:
        spark = SparkSession.getActiveSession()
    elif args.cores:
        spark = get_spark(app_name="build_index", cores=args.cores)
    else:
        spark = SparkSession.builder.appName("build_index").getOrCreate()

    docs = (
        spark.read.table(args.input)
        if not args.input.startswith(("/", "file:", "s3:", "hdfs:"))
        else spark.read.parquet(args.input)
    )
    t0 = time.time()
    build_index(spark, docs, args.output, **cfg.as_kwargs())
    out = {
        "build_sec": round(time.time() - t0, 2),
        "metrics": build_metrics(spark, args.output),
    }
    json.dump(out, sys.stdout, default=str)
    print()


if __name__ == "__main__":
    main()
