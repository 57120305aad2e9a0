#!/usr/bin/env python3
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., ...extras}

Extras reported (BASELINE.md targets):
* build_docs_per_sec — SPIMI index build throughput (extract -> compact);
* query_p50_ms / query_p95_ms — per-query BM25 BMW top-10 latency over the
  5-query reference set, measured per query on the built index;
* SPARK_GRAFT_SCALING=1 additionally builds the SYNTHETIC sf-bench corpus
  (200k docs x ~500 tokens — the driver's documents table is only 5k rows,
  far too small for parallelism to beat fixed overhead) at local[2] and
  local[8] (the north rule's N -> 4N pair) plus local[32] for peak
  throughput, and reports efficiency ((T2/T8)/4). The 2->8 pair is used
  because a raw-CPU probe (multiprocessing busy loops; see BENCH.md) shows
  this box scales linearly only up to ~8-16 processes — 8->32 tops out at
  2.7x total throughput (SMT), capping any 8->32 efficiency at 0.67 before
  a single line of Spark runs. Each timed run is preceded by an untimed
  warm build so JVM JIT state is comparable between runs.

JIT warm-up runs before the timed region (session reuse on a long-lived
cluster amortizes it to zero; see session.warm_up docstring).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALING = os.environ.get("SPARK_GRAFT_SCALING", "0") == "1"
# SCALING_ONLY skips the headline/build/latency sections and runs JUST the
# N->4N scaling cells: every section burns burst CPU credits, and the
# scaling cells are the ones that need a full credit pool to record a
# gated (canary < 60ms) measurement.  Implies SCALING.
SCALING_ONLY = os.environ.get("SPARK_GRAFT_SCALING_ONLY", "0") == "1"
SCALING = SCALING or SCALING_ONLY

# Headline SQL queries (subset of the driver-contract surface; each is one
# Spark job over the sf tables).
HEADLINE = [
    "doc_stats",
    "postings",
    "term_df",
    "heavy_hitters",
    "bm25_topk",
    "quality_score",
    "lang_id",
    "fingerprint",
    "dedup_exact",
    "minhash_signatures",
    "lsh_candidates",
    "simhash",
    "ngram_jaccard",
    "ann_cosine_topk",
    "sessionize",
    "range_join",
    "topk_orders",
]


def _canary_ms() -> float:
    """One fixed numpy op; measures the sandbox's CURRENT effective CPU
    speed. This Firecracker microVM has burst/credit CPU throttling — the
    same op was observed at 12ms (full speed) and 4900ms (throttled), a
    400x swing — so every timed region must be gated and annotated.

    Min-of-3 BACK-TO-BACK samples (r5s4 fix): the FIRST sample after any
    idle period reads 100-370 ms on a full-speed box (frequency scaling /
    scheduler cold start — measured: post-5s-sleep pairs (365.7, 49.3),
    (32.4, 28.0) while fresh back-to-back runs read 8-13 ms), and
    _wait_for_cpu sleeps between polls, so single-sample canaries were
    cold-biased ~10x and gates timed out on a healthy machine. Genuine
    credit throttling is SUSTAINED — it slows all three samples — so the
    min removes the cold bias without letting a throttled box pass."""
    import numpy as np

    x = np.arange(2_000_000, dtype=np.float64)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float((x / (x + 1.7)).sum())
        best = min(best, (time.time() - t0) * 1000)
    return best


def _wait_for_cpu(threshold_ms: float = 100.0, timeout_s: float = 600.0) -> float:
    """Block until CPU speed recovers (canary under threshold); returns the
    last canary reading, which timed sections record for honesty.

    r4 refinement: the box's slowdowns OSCILLATE on a seconds scale (fast
    windows of tens of seconds between multi-second-canary stretches), so
    poll every 5 s — a 20 s stride often caught a window at its END, and
    the timed run then executed in the next slow stretch — and require TWO
    consecutive fast samples so the run starts at the beginning of a
    sustained window, not on a one-sample blip."""
    poll = float(os.environ.get("SPARK_GRAFT_GATE_POLL", "5"))
    deadline = time.time() + timeout_s
    fast = 0
    ms = _canary_ms()
    while time.time() < deadline:
        fast = fast + 1 if ms <= threshold_ms else 0
        if fast >= 2:
            return ms
        time.sleep(poll)
        ms = _canary_ms()
    return ms


def _fresh_session(cores: int):
    from pyspark.sql import SparkSession

    from pageindex_spark.session import get_spark, warm_up

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = get_spark(app_name=f"bench-{cores}", cores=cores, shuffle_partitions=max(cores, 8))
    warm_up(spark)
    return spark


def _build_once(spark, tag: str, cores: int, docs=None) -> tuple[float, int]:
    """Fresh index build; returns (sec, n_docs). Default input: the driver's
    documents table at SF_DIR; pass ``docs`` to build something else.

    num_partitions scales with the CORPUS (~6.2k docs / ~19 MB text per
    partition), not with cores — the r5 800k-doc curve point measured what
    fixing P at 8 does at 4x the data: per-task state grows 4x, the
    extract reduce and the segments builders hit memory-footprint walls,
    and the 2->8 cells flatline for a reason that has nothing to do with
    core count (extract 68 s -> 69 s). Constant work per task is also the
    honest cluster emulation: real deployments size partitions to a fixed
    split, and partition count at fixed corpus is identical across the
    compared cells either way."""
    from pyspark.sql import functions as F

    from pageindex_spark import build_index

    if docs is None:
        docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
            F.lpad(F.col("doc_id").cast("string"), 10, "0").alias("url"), "text"
        )
    n_docs = docs.count()
    out = f"/root/repo/data/bench_index_{tag}"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    build_index(
        spark,
        docs,
        out,
        num_partitions=max(cores, 8, n_docs // 6250),
        n_buckets=16,
        n_seg_chunks=1,
        n_bucket_chunks=1,
    )
    return time.time() - t0, n_docs


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pageindex_spark.driverq import BM25_QUERIES, paired_sql, register_views
    from pageindex_spark.plans.query import search

    spark = _fresh_session(CPUS)
    register_views(spark, SF_DIR)
    pairs = paired_sql()

    # Canary-gate EVERY timed section (VERDICT r2 #1): the r2 artifact's
    # 3.4x query-p50 regression was unadjudicable because only the scaling
    # block recorded CPU-speed evidence. Each section now waits for credit
    # recovery, then records the canary before/after — a section whose
    # gated flag is false is invalid by construction, not a perf signal.
    canaries: dict[str, dict] = {}

    def _gate(section: str, threshold_ms: float = 100.0) -> None:
        before = _wait_for_cpu(threshold_ms=threshold_ms, timeout_s=600.0)
        canaries[section] = {"before_ms": round(before, 1), "gated": before < threshold_ms}

    def _gate_end(section: str) -> None:
        after = _canary_ms()
        canaries[section]["after_ms"] = round(after, 1)
        canaries[section]["gated"] = bool(
            canaries[section]["gated"] and after < 4 * canaries[section]["before_ms"] + 100
        )

    queries: dict[str, float] = {}
    total = 0.0
    if SCALING_ONLY:
        out = {
            "metric": "scaling-only run (headline sections skipped to save CPU credits)",
            "value": 0.0,
            "unit": "sec",
            "queries": {},
            "sf": SF_DIR,
            "cpus": CPUS,
            "cpu_canaries": canaries,
        }
        _run_scaling(out)
        print(json.dumps(out))
        return
    _gate("headline")
    for name in HEADLINE:
        t0 = time.time()
        spark.sql(pairs[name][0]).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        queries[name] = round(dt, 3)
        total += dt
    _gate_end("headline")

    # Engine build + query latency.
    _gate("build")
    build_sec, n_docs = _build_once(spark, f"cpu{CPUS}", CPUS)
    _gate_end("build")
    queries["engine_build"] = round(build_sec, 3)
    total += build_sec
    idx = f"/root/repo/data/bench_index_cpu{CPUS}"

    # Untimed warm search: the first cogroup/Arrow-UDF job pays one-time
    # Python-worker + codegen setup (~tens of seconds in this sandbox) that a
    # long-lived cluster amortizes; latency numbers reflect steady state.
    search(spark, idx, BM25_QUERIES[:1], k=10, mode="bmw").collect()

    _gate("latency")
    lat = []
    for qid, qtext in BM25_QUERIES:
        t0 = time.time()
        search(spark, idx, [(qid, qtext)], k=10, mode="bmw").collect()
        lat.append(time.time() - t0)
    batch0 = time.time()
    search(spark, idx, BM25_QUERIES, k=10, mode="bmw").collect()
    batch_sec = time.time() - batch0
    _gate_end("latency")
    queries["engine_query_batch5"] = round(batch_sec, 3)
    total += sum(lat) + batch_sec

    out = {
        "metric": "headline suite wall time (sql ops + index build + BM25 top-10)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "cpus": CPUS,
        "n_docs": n_docs,
        "build_docs_per_sec": round(n_docs / build_sec, 1),
        "query_p50_ms": round(statistics.median(lat) * 1000, 1),
        "query_p95_ms": round(max(lat) * 1000, 1),
        "cpu_canaries": canaries,
        "gated": all(c["gated"] for c in canaries.values()),
    }

    if SCALING:
        _run_scaling(out)

    print(json.dumps(out))


def _run_scaling(out: dict) -> None:
    from pageindex_spark.sources.corpus import ensure_scale

    # Corpus for the N->4N pair. r2 measured that a 50k-doc build
    # (~90-200 s) OUTLASTS one burst-credit window, so whichever run
    # starts with more credits wins — set SPARK_GRAFT_SCALE_NAME to
    # sf-small (10k docs, ~15-25 s at full speed) to fit a build inside
    # one window; the canary gate then ensures each timed run starts at
    # full speed AND can finish before credits drain.
    # Default scale: the MULTI-FILE 50k corpus (sf-mid16) — a single-file
    # input caps the scan at len/maxPartitionBytes splits and flatlines the
    # cells regardless of engine scaling (r5 session-3 finding).
    scale_name = os.environ.get("SPARK_GRAFT_SCALE_NAME", "sf-mid16")
    # "2,8" runs just the north rule's N -> 4N pair — the local[32] cell
    # costs a third warm+timed build's worth of burst credits and the rule
    # doesn't need it (8->32 is hardware-capped at ~0.67 on this box).
    cells = tuple(
        int(c) for c in os.environ.get("SPARK_GRAFT_SCALE_CELLS", "2,8,32").split(",")
    )
    gate_timeout = float(os.environ.get("SPARK_GRAFT_GATE_TIMEOUT", "1800"))
    # Min-of-R repeats per cell (r4 protocol): this box's slowdown is
    # one-sided noise — it only ever ADDS wall time — so the MIN over R
    # timed builds converges on the true speed even when no single 30-min
    # canary gate ever fires (observed: 2 h with zero sustained sub-60 ms
    # windows). Per-repeat canaries are still recorded; if any repeat
    # started gated, the min is taken over gated repeats only.
    repeats = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "1"))
    bench_dir = ensure_scale(scale_name)
    # Scan-split sizing (r5s3 flatline fix): the extract stage's MAP side
    # (source scan + range-shuffle write) parallelizes only as far as the
    # input SPLITS, and the sandbox corpus is one/few parquet files — at
    # the default 128 MB maxPartitionBytes every cell scanned 2-6-way and
    # the walls flatlined across 2/8/32 cores while the task bodies
    # themselves scale at 0.82-0.95 (probe artifacts). 8 MB makes splits
    # track cores on the ~150 MB corpus; a real cluster gets this for free
    # from its thousands-of-files input layout.
    max_part = os.environ.get("SPARK_GRAFT_MAX_PART_BYTES", "8m")
    scaling = {}
    for cores in cells:
        spark = _fresh_session(cores)
        spark.conf.set("spark.sql.files.maxPartitionBytes", max_part)
        mid = spark.read.parquet(
            os.path.join(bench_dir, "documents.parquet")
        ).select("url", "text")
        # Gate BEFORE the warm build too (r4 lesson: warming while
        # throttled burns minutes of wall at 50-100x slowdown and deepens
        # the very credit debt the timed gate then waits out).
        _wait_for_cpu(threshold_ms=60.0, timeout_s=min(gate_timeout, 300.0))
        # untimed warm build (JIT/codegen parity between timed runs);
        # small on purpose — every warm doc burns burst credits the
        # timed run needs.
        _build_once(spark, f"warm{cores}", cores, docs=mid.limit(500))
        tries = []
        for _ in range(repeats):
            # gate: a timed run that starts throttled measures the PREVIOUS
            # run's debt. `gated` records whether full speed was actually
            # reached — single-shot numbers with gated=false are invalid by
            # construction; min-of-R reports the best honest attempt.
            canary = _wait_for_cpu(threshold_ms=60.0, timeout_s=gate_timeout)
            sec, n = _build_once(spark, f"scale{cores}", cores, docs=mid)
            after = _canary_ms()
            tries.append(
                {
                    "build_sec": round(sec, 2),
                    "cpu_canary_ms": round(canary, 1),
                    "cpu_canary_after_ms": round(after, 1),
                    # Same rule as _gate_end (VERDICT r4 "what's wrong" #1):
                    # a repeat that STARTED fast but finished throttled
                    # (after-canary blown) ran partly at reduced speed — its
                    # wall time is as invalid as one that started slow. The
                    # before-only check recorded two mid-run-throttled builds
                    # as gated and produced a false valid_2_to_8 artifact.
                    "gated": canary < 60.0 and after < 4 * canary + 100,
                    # ADDITIVE diagnostic, does NOT relax `gated`: did the
                    # box's speed hold steady across the run (after-canary
                    # within noise of before)? On the burst-credit host,
                    # steady+ungated never happens (loaded runs crash the
                    # canary to seconds). The end-r5 session's rebooted host
                    # shows a DIFFERENT regime: constant ~90-130 ms canary,
                    # no crash under 32-core load, instant recovery (probe
                    # in BENCH.md) — i.e. a uniformly ~8x-slower machine,
                    # not a throttled one. There the N->4N RATIO stays
                    # valid (a constant per-core factor cancels), which
                    # `steady` on both cells evidences while `gated`
                    # honestly stays false.
                    "steady": after < 1.5 * canary + 50,
                }
            )
        gated_tries = [t for t in tries if t["gated"]] or tries
        best = min(gated_tries, key=lambda t: t["build_sec"])
        scaling[f"local{cores}"] = {
            "build_sec": best["build_sec"],
            "docs_per_sec": round(n / best["build_sec"], 1),
            "n_docs": n,
            "cpu_canary_ms": best["cpu_canary_ms"],
            "cpu_canary_after_ms": best["cpu_canary_after_ms"],
            "gated": best["gated"],
            "steady": best["steady"],
            "repeats": tries,
        }
    # Ratios are guarded per cell pair (ADVICE r4 low: SPARK_GRAFT_SCALE_CELLS
    # subsets like "8,32" crashed here with KeyError AFTER the expensive
    # builds, discarding the measurements).
    if 2 in cells and 8 in cells:
        t2 = scaling["local2"]["build_sec"]
        t8 = scaling["local8"]["build_sec"]
        scaling["efficiency_2_to_8"] = round((t2 / t8) / 4.0, 3)
        # The north rule names ONE cell: N -> 4N. local2 -> local8 is that
        # pair (local32 is extra color; this box's raw-CPU ceiling caps 8->32
        # at ~0.67 before Spark runs — see module docstring).
        scaling["valid_2_to_8"] = bool(
            scaling["local2"]["gated"] and scaling["local8"]["gated"]
        )
        # Steady-host companion verdict (see the `steady` field note): on a
        # constant-speed machine the ratio is trustworthy even though the
        # absolute walls carry the machine's uniform slowdown.
        scaling["steady_2_to_8"] = bool(
            scaling["local2"]["steady"] and scaling["local8"]["steady"]
        )
    if 8 in cells and 32 in cells:
        scaling["efficiency_8_to_32"] = round(
            (scaling["local8"]["build_sec"] / scaling["local32"]["build_sec"]) / 4.0,
            3,
        )
    scaling["scale_name"] = scale_name
    scaling["valid"] = all(
        scaling[f"local{c}"]["gated"] for c in cells
    )
    out["scaling"] = scaling
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_scaling.json"),
        "w",
    ) as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
