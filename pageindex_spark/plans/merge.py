"""Index merge: combine committed batch indexes into one (Lucene
``addIndexes`` parity — the reference has no index artifact to merge at
all; its "index" is one rebuilt-from-scratch JSON tree per document set,
``/root/reference/pageindex/utils.py``).

Multi-tenant and backfill pipelines build shards independently (per crawl,
per partner, per time range) and need ONE queryable index without paying a
full rebuild. ``merge_indexes`` produces it in two map-only passes plus
metadata work — postings are never decoded:

* **docID rebase is a varint splice, not a decode.** Source i's docIDs
  shift by the running slot total of sources 0..i-1. Inside a run only
  each BLOCK's first varint changes (block starts are absolute; every
  later byte is a delta-gap, invariant under a uniform shift), so
  ``operators.runfmt.shift_run`` rewrites n_blocks varints per run and
  passes gap/tf bytes through untouched. Source 0 (offset 0) streams
  through as raw Arrow batches.
* **Stats re-derive exactly.** df per term = sum of run ``n_docs`` over
  the merged runs (runs are docID-disjoint across sources by
  construction) — recomputed from written-run metadata, never blobs.
  n_docs/avgdl re-aggregate over the merged docs_extracted with the SAME
  ``F.avg`` the batch build uses (summing the sources' float avgdls would
  round), so merged idf/avgdl — and therefore every BM25 score — equal a
  fresh build over the concatenated corpus bit-for-bit.
* **Tie-break caveat (documented, Lucene-identical):** merged docID order
  is source order, so the "docID order == url order" oracle invariant
  holds only when the sources' url ranges are ordered and disjoint
  (shards split by url/crawl naturally satisfy this). Interleaved url
  ranges still score identically; only EXACT-tie ordering can differ
  from a from-scratch build.
* **Block-max validity:** each source's ``bm_maxq`` was computed at its
  own build avgdl. The merged meta records ``bound_avgdl = min(source
  bound_avgdls)`` and the Searcher inflates bounds by
  ``max(1, avgdl/bound_avgdl)`` (same mechanism, and the same upper-bound
  proof, as post-expunge serving — ``plans/expunge.py``); bounds computed
  at a LARGER avgdl than live are upper bounds as-is.

Commit point: ``meta.json`` is written LAST — a crashed merge leaves an
out_dir without meta, unreadable by construction; re-run with a fresh (or
the same, fully overwritten) out_dir. Light terms end with one run per
source; run ``operators.compaction.fold_light_runs`` over the merged runs
(or simply remerge fewer, larger shards) if per-term fan-in ever matters.

Sources must be batch indexes at the current format with no pending
tombstones (expunge first — merging would otherwise silently resurrect
deleted docs) and not streamed (a streamed index's lifecycle owns its
layout; refresh it into a batch shape first via its own full rebuild).
"""

from __future__ import annotations

import os
import shutil
from typing import Iterator

import pyarrow as pa
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators.compaction import (
    INDEX_SCHEMA,
    _INDEX_PA,
    _run_cols,
    run_from_row,
    term_stats_from_runs,
    with_term_bucket,
)
from ..operators.runfmt import shift_run
from ..sources.tables import read_meta, write_meta
from .build_index import FORMAT_VERSION, IndexPaths


def _check_source(meta: dict, src: str) -> None:
    if int(meta.get("format_version", 0)) != FORMAT_VERSION:
        raise ValueError(
            f"{src}: format_version={meta.get('format_version')} != "
            f"{FORMAT_VERSION}; rebuild before merging across formats"
        )
    if "streamed" in meta:
        raise ValueError(
            f"{src}: streamed index — refresh it to a batch shape first "
            "(its delta layout is owned by the streaming lifecycle)"
        )
    if meta.get("storage") == "iceberg":
        raise NotImplementedError(f"{src}: iceberg-backed merge not wired")
    if int((meta.get("deletes") or {}).get("n_deleted", 0)) > 0:
        raise ValueError(
            f"{src}: pending tombstones — expunge_index() first (merging "
            "would resurrect deleted docs)"
        )


def _shift_runs_df(runs, offset: int):
    """Map-only docID rebase of a runs relation (see module docstring).
    offset == 0 passes batches through as raw Arrow buffers."""
    cols = [f.name for f in _INDEX_PA]

    def rewrite(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            batch = batch.select(cols)
            if offset == 0:
                yield batch
                continue
            out: dict[str, list] = {k: [] for k in cols}
            for row in batch.to_pylist():
                _run_cols(
                    row["term"],
                    row["run_id"],
                    shift_run(run_from_row(row), offset),
                    out,
                )
            if out["term"]:
                yield from pa.table(out, schema=_INDEX_PA).to_batches()

    return runs.select(cols).mapInArrow(rewrite, schema=INDEX_SCHEMA)


def merge_indexes(
    spark: SparkSession, src_dirs: list[str], out_dir: str
) -> IndexPaths:
    """Merge >= 2 committed batch indexes into one at ``out_dir`` (fully
    overwritten). Returns the merged IndexPaths. Scores equal a fresh
    build over the concatenated corpora; see module docstring for the
    exact-tie ordering caveat and crash semantics."""
    from .expunge import recover_expunge

    if len(src_dirs) < 2:
        raise ValueError("merge_indexes needs at least two source indexes")
    metas = []
    for src in src_dirs:
        recover_expunge(src)
        meta = read_meta(src)
        _check_source(meta, src)
        metas.append(meta)

    n_buckets = int(metas[0]["n_buckets"])
    srcs = [IndexPaths(d) for d in src_dirs]
    slot_offsets: list[int] = []
    part_offsets: list[int] = []
    acc_slots = acc_parts = 0
    for m in metas:
        slot_offsets.append(acc_slots)
        part_offsets.append(acc_parts)
        acc_slots += int(m.get("n_slots", m["n_docs"]))
        acc_parts += len(m["grid"])

    out = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    for p in (out.docs_extracted, out.norms, out.postings, out.term_stats):
        shutil.rmtree(p, ignore_errors=True)

    # docs_extracted: one map-only pass per source (part_id rebased; the
    # partitionBy write keeps one dir per part, no shuffle).
    ext = None
    for sp, poff in zip(srcs, part_offsets):
        d = spark.read.parquet(sp.docs_extracted).select(
            (F.col("part_id").cast("int") + F.lit(poff)).alias("part_id"),
            "local_pos",
            "url",
            "text",
            "doc_len",
        )
        ext = d if ext is None else ext.unionByName(d)
    ext.write.mode("overwrite").partitionBy("part_id").parquet(
        out.docs_extracted
    )

    # norms: P rows per source — rebase part ids and docID ranges.
    nm = None
    for sp, poff, doff in zip(srcs, part_offsets, slot_offsets):
        d = spark.read.parquet(sp.norms).select(
            (F.col("part_id") + F.lit(poff)).cast("int").alias("part_id"),
            (F.col("first_doc") + F.lit(doff)).cast("long").alias("first_doc"),
            "n_docs",
            "dl_blob",
        )
        nm = d if nm is None else nm.unionByName(d)
    nm.write.mode("overwrite").parquet(out.norms)

    # postings: varint-splice rebase per source, re-bucket, one write.
    runs = None
    for sp, doff in zip(srcs, slot_offsets):
        d = _shift_runs_df(
            spark.read.parquet(sp.postings).drop("bucket"), doff
        )
        runs = d if runs is None else runs.unionByName(d)
    with_term_bucket(runs, n_buckets).write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(out.postings)

    # term_stats from the WRITTEN merged runs (metadata only, never blobs;
    # rereading avoids re-executing the shift — same rule as build_index).
    ts = with_term_bucket(
        term_stats_from_runs(spark.read.parquet(out.postings).drop("bucket")),
        n_buckets,
    )
    ts.write.mode("overwrite").partitionBy("bucket").parquet(out.term_stats)

    grid: list[int] = []
    for m, doff in zip(metas, slot_offsets):
        grid.extend(int(g) + doff for g in m["grid"])
    # Stats from the WRITTEN merged docs: the same F.avg the batch build
    # uses (bit-identical float to a fresh build over the concatenation),
    # and correct for expunged sources whose norms keep dead-slot dl
    # padding (live rows exist only in docs_extracted).
    row = (
        spark.read.parquet(out.docs_extracted)
        .agg(F.count("*").alias("n"), F.avg("doc_len").alias("avgdl"))
        .collect()[0]
    )
    n_docs = int(row["n"])
    meta = {
        "format_version": FORMAT_VERSION,
        "n_docs": n_docs,
        "avgdl": float(row["avgdl"] or 0.0),
        "grid": grid,
        "num_partitions": len(grid),
        "n_buckets": n_buckets,
        "block_size": int(metas[0]["block_size"]),
        "target_run_bytes": int(metas[0]["target_run_bytes"]),
        "bm25": dict(metas[0]["bm25"]),
        "storage": "parquet",
        "iceberg_table": None,
        "n_slots": acc_slots,
        # worst-case source bound: the Searcher's bound_scale inflation
        # (max(1, avgdl/bound_avgdl)) then covers every source's bm_maxq.
        "bound_avgdl": min(
            float(m.get("bound_avgdl", m["avgdl"])) for m in metas
        ),
        "merged_from": [os.path.abspath(d) for d in src_dirs],
    }
    write_meta(out_dir, meta)  # atomic commit point (written LAST)
    return out
