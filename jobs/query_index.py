#!/usr/bin/env python3
"""spark-submit entry: BM25 top-k search over a built index.

    spark-submit --py-files pageindex_spark.zip jobs/query_index.py \
        --index /path/to/index --query "rare term" --k 10 [--mode bmw|dense] \
        [--with-text] [--fixed-point]

--with-text returns each winner's extracted text (reference retrieval
parity); --fixed-point ranks over floor(score*1e6) with doc_id tie-break
(cross-engine-deterministic rank assignment).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", action="append", required=True, help="repeatable")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--mode", choices=["bmw", "dense"], default="bmw")
    ap.add_argument("--with-text", action="store_true")
    ap.add_argument("--fixed-point", action="store_true")
    ap.add_argument("--cores", type=int, default=None, help="local mode only")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from pageindex_spark import search
    from pageindex_spark.session import get_spark

    if SparkSession.getActiveSession() is not None:
        spark = SparkSession.getActiveSession()
    elif args.cores:
        spark = get_spark(app_name="query_index", cores=args.cores)
    else:
        spark = SparkSession.builder.appName("query_index").getOrCreate()

    queries = [(i + 1, q) for i, q in enumerate(args.query)]
    rows = search(
        spark, args.index, queries, k=args.k, mode=args.mode,
        fixed_point=args.fixed_point, with_text=args.with_text,
    ).collect()
    for r in rows:
        rec = {
            "query_id": r["query_id"], "rank": r["rank"],
            "url": r["url"], "score": r["score"],
        }
        if args.with_text:
            rec["text"] = r["text"]
        json.dump(rec, sys.stdout)
        print()


if __name__ == "__main__":
    main()
