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

from ..functions.tokenizer import ASCII_SEP_PATTERN, TOKEN_SPLIT_RE
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


def _tokenize_arrow(texts) -> tuple[np.ndarray, np.ndarray, np.ndarray, list[str]]:
    """Arrow-compute tokenization of a string column — zero per-token Python.

    Returns (sorted_term_codes_per_token? no): (codes int64 in SORTED-term
    order, doc_idx int64 per kept token, doc_lens int64 per doc,
    sorted_terms list[str])."""
    import pyarrow.compute as pc

    arr = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) else pa.array(
        texts, pa.string()
    )
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n_docs = len(arr)
    # Lockstep discipline (functions/tokenizer.py): strip to the ASCII
    # alphabet BEFORE utf8_lower — Arrow's lowercase disagrees with
    # Python/JVM on e.g. U+0130, but never on pure ASCII.
    cleaned = pc.replace_substring_regex(
        pc.coalesce(arr, pa.scalar("")), pattern=ASCII_SEP_PATTERN, replacement=" "
    )
    toks = pc.split_pattern_regex(pc.utf8_lower(cleaned), TOKEN_SPLIT_RE.pattern)
    flat = pc.list_flatten(toks)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(keep))
    doc_idx = doc_idx[keep]
    doc_lens = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
    if len(flat) == 0:
        return (
            np.empty(0, np.int64),
            doc_idx,
            doc_lens,
            [],
        )
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    raw_codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dictionary = enc.dictionary.to_pylist()
    # dictionary order is first-occurrence; remap to sorted-term codes.
    order = np.argsort(np.asarray(dictionary, dtype=object), kind="stable")
    rank = np.empty(len(order), dtype=np.int64)
    rank[order] = np.arange(len(order))
    codes = rank[raw_codes]
    sorted_terms = [dictionary[i] for i in order]
    return codes, doc_idx, doc_lens, sorted_terms


def build_segments_arrow(
    doc_ids: np.ndarray,
    texts,
    avgdl: float,
    seg_id: int,
    block_size: int = BLOCK_SIZE,
) -> pa.Table:
    """Pure function: one partition's docs -> segment rows (testable sans
    Spark). FULLY vectorized: Arrow-compute tokenization (C++ regex split +
    dictionary encode), one global varbyte encode of all gaps/tfs +
    byte-offset slicing per term, ``reduceat`` for per-block metadata — the
    only per-term Python is assembling the output lists."""
    codes, doc_idx, doc_lens, uniques = _tokenize_arrow(texts)
    if len(codes) == 0:
        return _SEGMENT_PA_SCHEMA.empty_table()

    n_docs_local = len(doc_lens)
    # Composite key (term_code, local_doc): single int64 sort + RLE for tf.
    key = codes * n_docs_local + doc_idx
    key.sort(kind="stable")
    uniq_key, tf = np.unique(key, return_counts=True)
    term_code = uniq_key // n_docs_local
    local_doc = uniq_key % n_docs_local
    global_doc = np.asarray(doc_ids)[local_doc].astype(np.uint64)
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
        ids_parts, pid_parts, text_parts = [], [], []
        for b in batches:
            ids_parts.append(b.column("doc_id").to_numpy(zero_copy_only=False))
            pid_parts.append(b.column("part_id").to_numpy(zero_copy_only=False))
            text_parts.append(b.column("text"))
        if not ids_parts:
            return
        doc_ids = np.concatenate(ids_parts)
        part_ids = np.concatenate(pid_parts)
        texts = pa.concat_arrays(
            a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
            for a in text_parts
        )
        order = np.argsort(doc_ids, kind="stable")
        doc_ids, part_ids = doc_ids[order], part_ids[order]
        texts = texts.take(pa.array(order))
        for pid in np.unique(part_ids):
            sel = np.flatnonzero(part_ids == pid)
            tbl = build_segments_arrow(
                doc_ids[sel], texts.take(pa.array(sel)), avgdl, int(pid), block_size
            )
            yield from tbl.to_batches(max_chunksize=4096)

    return docs_with_ids.select("doc_id", "part_id", "text").mapInArrow(
        per_partition, schema=SEGMENT_SCHEMA
    )
