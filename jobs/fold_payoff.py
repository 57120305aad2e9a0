#!/usr/bin/env python3
"""Fold-stage payoff micro-bench (VERDICT r2 #7): measure what the
second-level fold actually buys at query time — runs READ per query and
slice-stage wall — by building the SAME corpus with fold_light=False vs
True and querying identical mid-frequency terms.

The claim under test: structural salting leaves every term ~P/parts_per_group
level-1 runs regardless of size, so an unfolded index drags (runs x queries)
row reads through the pruned postings scan; the fold collapses the light
long tail to 1 run/term, cutting read fan-in without touching heavy terms.

Protocol (sandbox honesty rules): each timed region is canary-gated; the
per-variant MIN over --repeats is reported (throttle noise is one-sided).
Results land in BENCH_fold_payoff.json; cite in BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _canary_ms() -> float:
    import numpy as np

    x = np.arange(2_000_000, dtype=np.float64)
    t0 = time.time()
    float((x / (x + 1.7)).sum())
    return (time.time() - t0) * 1000


def _wait_for_cpu(threshold_ms: float = 60.0, timeout_s: float = 900.0) -> float:
    deadline = time.time() + timeout_s
    ms = _canary_ms()
    while ms > threshold_ms and time.time() < deadline:
        time.sleep(15)
        ms = _canary_ms()
    return ms


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="sf-small", help="sources.corpus scale name")
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--gate-timeout", type=float, default=900.0)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pageindex_spark import build_index, search
    from pageindex_spark.session import get_spark, warm_up
    from pageindex_spark.sources.corpus import ensure_scale

    spark = get_spark(app_name="fold-payoff", cores=args.cores)
    warm_up(spark)
    data_dir = ensure_scale(args.scale)
    docs = spark.read.parquet(os.path.join(data_dir, "documents.parquet")).select(
        "url", "text"
    )

    out: dict = {"scale": args.scale, "partitions": args.partitions}
    indexes = {}
    for fold in (False, True):
        tag = "fold" if fold else "nofold"
        idx = f"/root/repo/data/fold_payoff_{tag}"
        shutil.rmtree(idx, ignore_errors=True)
        build_index(
            spark, docs, idx,
            num_partitions=args.partitions, n_buckets=16,
            n_seg_chunks=1, n_bucket_chunks=1, fold_light=fold,
        )
        indexes[tag] = idx

    # Mid-frequency terms from the folded index's term_stats (df 50..500,
    # deterministic pick). These are exactly the long-tail terms the fold
    # targets: big enough to appear in many salt groups, small enough to
    # fold to one run.
    ts = spark.read.parquet(os.path.join(indexes["fold"], "term_stats"))
    mids = [
        r["term"]
        for r in ts.filter((F.col("df") >= 50) & (F.col("df") <= 500))
        .orderBy("term")
        .limit(8)
        .collect()
    ]
    assert mids, "no mid-frequency terms at this scale"
    queries = [(i + 1, t) for i, t in enumerate(mids)]

    for tag, idx in indexes.items():
        postings = spark.read.parquet(os.path.join(idx, "postings"))
        runs_read = postings.filter(F.col("term").isin(mids)).count()
        # warm (payload/codegen), then timed repeats; keep the min.
        search(spark, idx, queries, k=10, mode="bmw").collect()
        walls, canaries, afters = [], [], []
        for _ in range(args.repeats):
            c = _wait_for_cpu(timeout_s=args.gate_timeout)
            t0 = time.time()
            search(spark, idx, queries, k=10, mode="bmw").collect()
            walls.append(round(time.time() - t0, 3))
            canaries.append(round(c, 1))
            afters.append(round(_canary_ms(), 1))
        total_runs = postings.count()
        # Best wall among GATED repeats when any exist (slowdown noise is
        # one-sided: a repeat that started at full speed measures the code,
        # one that started throttled measures the box). A repeat is gated
        # only if it started fast AND was still fast right after — the same
        # before+after rule as bench.py's _gate_end (VERDICT r4 next #4).
        gated_walls = [
            w
            for w, c, a in zip(walls, canaries, afters)
            if c < 60.0 and a < 4 * c + 100
        ]
        best = min(gated_walls) if gated_walls else min(walls)
        out[tag] = {
            "runs_read_for_8_mid_terms": runs_read,
            "total_index_runs": total_runs,
            "query_walls_sec": walls,
            "best_wall_sec": best,
            "canaries_ms": canaries,
            "after_canaries_ms": afters,
            "gated": bool(gated_walls),
        }

    out["runs_read_ratio"] = round(
        out["nofold"]["runs_read_for_8_mid_terms"]
        / max(1, out["fold"]["runs_read_for_8_mid_terms"]),
        2,
    )
    out["wall_ratio"] = round(
        out["nofold"]["best_wall_sec"] / out["fold"]["best_wall_sec"], 3
    )
    path = "/root/repo/BENCH_fold_payoff.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
