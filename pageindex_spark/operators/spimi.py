"""SPIMI-style per-partition posting-segment construction (build step 3).

Reference parity: this replaces PageIndex's per-group "structure generation"
fold (``/root/reference/pageindex/page_index.py:568-587`` — sessionize pages,
then build index entries per group) with the classic single-pass-in-memory
indexing (SPIMI, Heinz & Zobel 2003) per Spark partition:

* input: docID-assigned documents, range-partitioned by url==docID order
  (``docids.assign_doc_ids``), so every partition owns a contiguous,
  disjoint docID range — segment merge later is an ordered concat;
* per partition (one ``mapInArrow`` task): tokenize, count (term, doc) tf,
  and emit one row per term: a block-aligned compressed Run (``runfmt``);
* all heavy lifting is numpy/pandas over Arrow batches: factorize terms,
  radix-style lexsort, ``reduceat`` for per-term/block aggregation — the
  only per-string Python is the tokenizer regex itself.

Output segment schema (SEGMENT_SCHEMA): one row per (term, segment), where
``seg_id`` is the build partition id. This is the pre-shuffle state; see
``compaction.py`` for the hash(term) shuffle + salted merge.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.tokenizer import TOKEN_SPLIT_RE
from .codec import BLOCK_SIZE
from .runfmt import encode_run

SEGMENT_SCHEMA = (
    "term string, seg_id int, first_doc long, last_doc long, n_docs long, "
    "doc_blob binary, tf_blob binary, bm_last array<long>, bm_maxq array<double>, "
    "bm_doc_off array<int>, bm_tf_off array<int>, bm_ndocs array<int>"
)

_SEGMENT_PA_SCHEMA = pa.schema(
    [
        pa.field("term", pa.string()),
        pa.field("seg_id", pa.int32()),
        pa.field("first_doc", pa.int64()),
        pa.field("last_doc", pa.int64()),
        pa.field("n_docs", pa.int64()),
        pa.field("doc_blob", pa.binary()),
        pa.field("tf_blob", pa.binary()),
        pa.field("bm_last", pa.list_(pa.int64())),
        pa.field("bm_maxq", pa.list_(pa.float64())),
        pa.field("bm_doc_off", pa.list_(pa.int32())),
        pa.field("bm_tf_off", pa.list_(pa.int32())),
        pa.field("bm_ndocs", pa.list_(pa.int32())),
    ]
)


def build_segments_arrow(
    doc_ids: np.ndarray,
    texts: list[str],
    avgdl: float,
    seg_id: int,
    block_size: int = BLOCK_SIZE,
) -> pa.Table:
    """Pure function: one partition's docs -> segment rows (testable sans Spark)."""
    tok_lists = [TOKEN_SPLIT_RE.split(t.lower()) if t else [] for t in texts]
    # Flatten with doc index; drop '' tokens produced at string edges.
    all_toks: list[str] = []
    doc_idx_parts = []
    doc_lens = np.zeros(len(texts), dtype=np.int64)
    for i, toks in enumerate(tok_lists):
        toks = [t for t in toks if t]
        doc_lens[i] = len(toks)
        all_toks.extend(toks)
        doc_idx_parts.append(np.full(len(toks), i, dtype=np.int64))
    if not all_toks:
        return _SEGMENT_PA_SCHEMA.empty_table()
    doc_idx = np.concatenate(doc_idx_parts)

    codes, uniques = pd.factorize(pd.array(all_toks), sort=True)
    n_docs_local = len(texts)
    # Composite key (term_code, local_doc): single int64 sort + RLE for tf.
    key = codes.astype(np.int64) * n_docs_local + doc_idx
    key.sort(kind="stable")
    uniq_key, tf = np.unique(key, return_counts=True)
    term_code = uniq_key // n_docs_local
    local_doc = uniq_key % n_docs_local
    global_doc = doc_ids[local_doc].astype(np.uint64)
    dl = doc_lens[local_doc]

    # Per-term boundaries (term_code is sorted).
    term_starts = np.concatenate(([0], np.flatnonzero(np.diff(term_code)) + 1))
    term_ends = np.concatenate((term_starts[1:], [len(term_code)]))

    rows = {name: [] for name in _SEGMENT_PA_SCHEMA.names}
    for s, e in zip(term_starts, term_ends):
        run = encode_run(global_doc[s:e], tf[s:e], dl[s:e], avgdl, block_size)
        rows["term"].append(str(uniques[term_code[s]]))
        rows["seg_id"].append(seg_id)
        rows["first_doc"].append(run.first_doc)
        rows["last_doc"].append(run.last_doc)
        rows["n_docs"].append(run.n_docs)
        rows["doc_blob"].append(run.doc_blob)
        rows["tf_blob"].append(run.tf_blob)
        rows["bm_last"].append(run.bm_last.tolist())
        rows["bm_maxq"].append(run.bm_maxq.tolist())
        rows["bm_doc_off"].append(run.bm_doc_off.tolist())
        rows["bm_tf_off"].append(run.bm_tf_off.tolist())
        rows["bm_ndocs"].append(run.bm_ndocs.tolist())
    return pa.table(rows, schema=_SEGMENT_PA_SCHEMA)


def build_segments(docs_with_ids, avgdl: float, block_size: int = BLOCK_SIZE):
    """DataFrame(doc_id, part_id, text) -> segments DF.

    One ``mapInArrow`` task may see rows of several build partitions (parquet
    file coalescing), so the builder groups by ``part_id`` and emits one
    segment group per partition — this guarantees no posting BLOCK ever spans
    a partition (grid) boundary, the invariant query-time cell slicing relies
    on. Rows are locally sorted by doc_id; partitions hold contiguous
    disjoint docID ranges (``assign_doc_ids``), so segments are globally
    disjoint and ordered.
    """

    def per_partition(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        ids_parts, pid_parts, texts = [], [], []
        for b in batches:
            ids_parts.append(b.column("doc_id").to_numpy(zero_copy_only=False))
            pid_parts.append(b.column("part_id").to_numpy(zero_copy_only=False))
            texts.extend(b.column("text").to_pylist())
        if not texts:
            return
        doc_ids = np.concatenate(ids_parts)
        part_ids = np.concatenate(pid_parts)
        order = np.argsort(doc_ids, kind="stable")
        doc_ids, part_ids = doc_ids[order], part_ids[order]
        texts = [texts[i] for i in order]
        for pid in np.unique(part_ids):
            sel = np.flatnonzero(part_ids == pid)
            tbl = build_segments_arrow(
                doc_ids[sel], [texts[i] for i in sel], avgdl, int(pid), block_size
            )
            yield from tbl.to_batches(max_chunksize=4096)

    return docs_with_ids.select("doc_id", "part_id", "text").mapInArrow(
        per_partition, schema=SEGMENT_SCHEMA
    )
