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
from .codec import BLOCK_SIZE, tf_quality, vb_encode

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
    """Pure function: one partition's docs -> segment rows (testable sans
    Spark). FULLY vectorized across terms: one global varbyte encode of all
    gaps/tfs + byte-offset slicing per term, ``reduceat`` for per-block
    metadata — the only per-term Python is assembling the output lists."""
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
    n = len(uniq_key)
    tf_u = tf.astype(np.uint64)

    # Per-term boundaries (term_code is sorted).
    term_starts = np.concatenate(([0], np.flatnonzero(np.diff(term_code)) + 1))
    term_ends = np.concatenate((term_starts[1:], [n]))
    n_terms = len(term_starts)

    # Block starts: every block_size-th posting WITHIN its term.
    local_idx = np.arange(n, dtype=np.int64) - np.repeat(
        term_starts, term_ends - term_starts
    )
    is_block_start = (local_idx % block_size) == 0
    block_starts = np.flatnonzero(is_block_start)

    # Delta-gap with reset at block starts (term starts are block starts).
    gaps = np.empty(n, dtype=np.uint64)
    gaps[0] = global_doc[0]
    np.subtract(global_doc[1:], global_doc[:-1], out=gaps[1:])
    gaps[block_starts] = global_doc[block_starts]

    # ONE varbyte encode for everything; per-value byte widths -> offsets.
    def _widths(vals: np.ndarray) -> np.ndarray:
        w = np.ones(n, dtype=np.int64)
        for j in range(1, 10):
            w += (vals >= np.uint64(1) << np.uint64(7 * j)).astype(np.int64)
        return w

    gap_blob = vb_encode(gaps)
    tf_blob = vb_encode(tf_u)
    gap_off = np.concatenate(([0], np.cumsum(_widths(gaps))))
    tf_off = np.concatenate(([0], np.cumsum(_widths(tf_u))))

    # Per-block metadata over the global arrays.
    q = tf_quality(tf_u, dl.astype(np.float64), avgdl)
    blk_max = np.maximum.reduceat(q, block_starts)
    blk_end = np.concatenate((block_starts[1:], [n]))
    blk_last = global_doc[blk_end - 1].astype(np.int64)
    blk_ndocs = (blk_end - block_starts).astype(np.int32)
    # Index of each term's first block within the global block arrays.
    term_first_block = np.searchsorted(block_starts, term_starts, side="left")
    term_last_block = np.searchsorted(block_starts, term_ends, side="left")

    terms_list = [str(uniques[term_code[s]]) for s in term_starts]
    first_docs = global_doc[term_starts].astype(np.int64)
    last_docs = global_doc[term_ends - 1].astype(np.int64)

    rows = {
        "term": terms_list,
        "seg_id": [seg_id] * n_terms,
        "first_doc": first_docs.tolist(),
        "last_doc": last_docs.tolist(),
        "n_docs": (term_ends - term_starts).tolist(),
        "doc_blob": [
            gap_blob[gap_off[s] : gap_off[e]]
            for s, e in zip(term_starts, term_ends)
        ],
        "tf_blob": [
            tf_blob[tf_off[s] : tf_off[e]] for s, e in zip(term_starts, term_ends)
        ],
        "bm_last": [
            blk_last[a:b].tolist()
            for a, b in zip(term_first_block, term_last_block)
        ],
        "bm_maxq": [
            blk_max[a:b].tolist() for a, b in zip(term_first_block, term_last_block)
        ],
        "bm_doc_off": [
            (gap_off[block_starts[a:b]] - gap_off[term_starts[i]]).tolist()
            + [int(gap_off[term_ends[i]] - gap_off[term_starts[i]])]
            for i, (a, b) in enumerate(zip(term_first_block, term_last_block))
        ],
        "bm_tf_off": [
            (tf_off[block_starts[a:b]] - tf_off[term_starts[i]]).tolist()
            + [int(tf_off[term_ends[i]] - tf_off[term_starts[i]])]
            for i, (a, b) in enumerate(zip(term_first_block, term_last_block))
        ],
        "bm_ndocs": [
            blk_ndocs[a:b].tolist()
            for a, b in zip(term_first_block, term_last_block)
        ],
    }
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
