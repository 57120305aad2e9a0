#!/usr/bin/env python3
"""spark-submit entry: fold committed streamed micro-batches into a
queryable index (streaming -> query handoff).

    spark-submit --py-files pageindex_spark.zip jobs/refresh_index.py \
        --segments /data/stream/segs --state /data/stream/state \
        --output /data/index [--num-partitions P] [--buckets B]

Prints one JSON line {"n_docs": ..., "avgdl": ..., "batches": [...]} on
success. Idempotent: re-running converges to the same bytes. The resulting
index is served by jobs/query_index.py unchanged.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--segments", required=True)
    ap.add_argument("--state", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--num-partitions", type=int, default=None)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--no-fold", action="store_true")
    ap.add_argument("--cores", type=int, default=None, help="local mode only")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from pageindex_spark.session import get_spark
    from pageindex_spark.sources.tables import read_meta
    from pageindex_spark.streaming.ingest import refresh_streamed_index

    if SparkSession.getActiveSession() is not None:
        spark = SparkSession.getActiveSession()
    elif args.cores:
        spark = get_spark(app_name="refresh_index", cores=args.cores)
    else:
        spark = SparkSession.builder.appName("refresh_index").getOrCreate()

    refresh_streamed_index(
        spark,
        args.segments,
        args.state,
        args.output,
        num_partitions=args.num_partitions,
        n_buckets=args.buckets,
        fold_light=not args.no_fold,
    )
    meta = read_meta(args.output)
    print(
        json.dumps(
            {
                "n_docs": meta["n_docs"],
                "avgdl": meta["avgdl"],
                "batches": meta.get("streamed", {}).get("batches", []),
            }
        )
    )


if __name__ == "__main__":
    main()
