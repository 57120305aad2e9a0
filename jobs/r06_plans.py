#!/usr/bin/env python3
"""Round-6 optimization instrumentation: capture .explain("formatted") for
every headline bench query and (optionally) time each with the noop sink.

Usage:
  python jobs/r06_plans.py before            # write plans/r06/<q>_before.txt
  python jobs/r06_plans.py after             # write plans/r06/<q>_after.txt
  python jobs/r06_plans.py before --time 3   # also min-of-3 noop timings

Plans go to /root/repo/plans/r06/ (committed; the judge reads them).
Timing JSON (when --time) goes to /root/repo/plans/r06/timings_<tag>.json.
This file is NOT bench.py (which stays frozen); it exists so plan diffs and
isolated per-query numbers are reproducible without touching the contract.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
OUT_DIR = "/root/repo/plans/r06"

HEADLINE = [
    "doc_stats", "postings", "term_df", "heavy_hitters", "bm25_topk",
    "quality_score", "lang_id", "fingerprint", "dedup_exact",
    "minhash_signatures", "lsh_candidates", "simhash", "ngram_jaccard",
    "ann_cosine_topk", "sessionize", "range_join", "topk_orders",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    n_time = 0
    if "--time" in sys.argv:
        n_time = int(sys.argv[sys.argv.index("--time") + 1])
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))

    from pageindex_spark.driverq import paired_sql, register_views
    from pageindex_spark.session import get_spark, warm_up

    spark = get_spark(app_name=f"r06-plans-{tag}", cores=CPUS,
                      shuffle_partitions=max(CPUS, 8))
    warm_up(spark)
    register_views(spark, SF_DIR)
    pairs = paired_sql()
    os.makedirs(OUT_DIR, exist_ok=True)

    timings: dict[str, list[float]] = {}
    for name in HEADLINE:
        if only and name not in only:
            continue
        df = spark.sql(pairs[name][0])
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(OUT_DIR, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        if n_time:
            samples = []
            for _ in range(n_time):
                spark.sparkContext.setJobDescription(f"r06:{name}")
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            timings[name] = samples
            print(f"{name}: min={min(samples)} samples={samples}", flush=True)

    if n_time:
        path = os.path.join(OUT_DIR, f"timings_{tag}.json")
        existing = {}
        if os.path.exists(path):
            existing = json.load(open(path))
        existing.update({k: {"min": min(v), "samples": v} for k, v in timings.items()})
        existing["sf"] = SF_DIR
        existing["cpus"] = CPUS
        json.dump(existing, open(path, "w"), indent=1)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
