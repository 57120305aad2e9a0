#!/usr/bin/env python3
"""Decode-count micro-bench: what would sequential-cell BMW threshold
threading buy? (VERDICT r3 next #8 — turn BENCH.md's documented
judgment call into a measurement.)

The query plan scores cells IN PARALLEL (cogroup) — each cell's BMW starts
from an empty heap. The alternative trades that parallelism for pruning:
process cells sequentially and thread the global top-k threshold into each
next cell (``wand.bmw_score_cell(prior_threshold=...)``). This job measures
the ONLY thing threading can buy — posting blocks decoded — on an in-memory
index (pure Python, no Spark: both modes run the identical scoring code, so
the decode ratio is exact, not timing-noise).

Protocol: build per-cell Runs for the synthetic corpus with the SAME
encode_run/block layout as the engine, run the 50-query reference set in
both modes, assert the final top-k (docs AND scores) is identical, and
report blocks decoded per mode. Writes BENCH_threshold_payoff.json.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from collections import Counter
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=4000)
    ap.add_argument("--cells", type=int, default=8)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from pageindex_spark.functions.tokenizer import tokenize
    from pageindex_spark.operators import wand
    from pageindex_spark.operators.runfmt import encode_run
    from pageindex_spark.operators.wand import (
        CellNorms,
        TopK,
        bmw_score_cell,
        idf_value,
    )
    from pageindex_spark.sources.corpus import make_documents, make_queries

    t0 = time.time()
    corpus = make_documents(args.docs, seed=21)
    order = np.argsort(corpus.url)  # docID order == url order (engine invariant)
    toks = [tokenize(corpus.text[i]) for i in order]
    n_docs = len(toks)
    doc_len = np.array([len(t) for t in toks], dtype=np.float64)
    avgdl = float(doc_len.mean())
    df = Counter()
    for t in toks:
        df.update(set(t))

    # Cells = equal docID ranges, exactly the query plan's grid cells.
    bounds = [round(c * n_docs / args.cells) for c in range(args.cells + 1)]
    cells = []
    for c in range(args.cells):
        lo, hi = bounds[c], bounds[c + 1]
        post: dict[str, list[tuple[int, int]]] = {}
        for d in range(lo, hi):
            for term, tf in Counter(toks[d]).items():
                post.setdefault(term, []).append((d, tf))
        runs = {}
        for term, plist in post.items():
            ds = np.array([p[0] for p in plist], dtype=np.uint64)
            ts = np.array([p[1] for p in plist], dtype=np.uint64)
            runs[term] = encode_run(ds, ts, doc_len[ds.astype(np.int64)], avgdl)
        cells.append((CellNorms(lo, doc_len[lo:hi]), runs))

    queries = make_queries()
    qterms = {
        qid: sorted(
            {t for t in tokenize(text) if t in df}
        )
        for qid, text in queries
    }
    payload = {
        qid: [(t, idf_value(n_docs, df[t])) for t in ts]
        for qid, ts in qterms.items()
        if ts
    }

    def top10(pairs_by_cell):
        tk = TopK(args.k)
        for pairs in pairs_by_cell:
            for d, s in pairs:
                tk.offer(s, d)
        return sorted(tk.items(), key=lambda x: (-x[1], x[0]))

    results = {}
    for mode in ("parallel", "threaded"):
        wand.DECODE_STATS["blocks"] = 0
        finals = {}
        for qid, term_idf in payload.items():
            if mode == "parallel":
                per_cell = [
                    bmw_score_cell(runs, norms, term_idf, avgdl, args.k)
                    for norms, runs in cells
                ]
                finals[qid] = top10(per_cell)
            else:
                tk = TopK(args.k)
                for norms, runs in cells:
                    pairs = bmw_score_cell(
                        runs, norms, term_idf, avgdl, args.k,
                        prior_threshold=tk.threshold(),
                    )
                    for d, s in pairs:
                        tk.offer(s, d)
                finals[qid] = sorted(tk.items(), key=lambda x: (-x[1], x[0]))
        results[mode] = {
            "blocks_decoded": wand.DECODE_STATS["blocks"],
            "finals": finals,
        }

    # Threading must not change the answer — identical docs AND scores.
    # ValueError, not assert (ADVICE r4 low): the artifact this job writes
    # is only meaningful if the identity check actually ran, -O included.
    for qid in payload:
        a, b = results["parallel"]["finals"][qid], results["threaded"]["finals"][qid]
        if [d for d, _ in a] != [d for d, _ in b]:
            raise ValueError(f"q{qid} docs diverge between modes")
        if not all(abs(x[1] - y[1]) < 1e-12 for x, y in zip(a, b)):
            raise ValueError(f"q{qid} scores diverge between modes")

    out = {
        "n_docs": n_docs,
        "cells": args.cells,
        "k": args.k,
        "n_queries": len(payload),
        "blocks_decoded_parallel": results["parallel"]["blocks_decoded"],
        "blocks_decoded_threaded": results["threaded"]["blocks_decoded"],
        "decode_ratio": round(
            results["parallel"]["blocks_decoded"]
            / max(1, results["threaded"]["blocks_decoded"]),
            3,
        ),
        "saved_pct": round(
            100.0
            * (1 - results["threaded"]["blocks_decoded"]
               / max(1, results["parallel"]["blocks_decoded"])),
            1,
        ),
        "identical_topk": True,
        "wall_sec": round(time.time() - t0, 1),
    }
    with open("/root/repo/BENCH_threshold_payoff.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
