"""Posting *run* format: block-aligned varbyte with per-block skip metadata.

A "run" is a contiguous, docID-sorted slice of one term's posting list —
the unit stored in the index table and shipped through shuffles. Format
decisions (all serving 100 TB-scale execution):

* delta-gap RESETS at every block boundary (first docID of each block is
  encoded absolute) -> any block is independently decodable;
* per-block byte offsets for the doc and tf blobs -> a run can be sliced to
  a docID sub-range by pure byte slicing (no decode) at block granularity,
  and query-time WAND decodes ONLY the blocks it cannot skip;
* per-block doc counts (``bm_ndocs``) instead of a fixed global block size ->
  two docID-disjoint ordered runs merge by PURE CONCATENATION of blobs and
  metadata arrays (no decode, no re-encode) — this is what makes the salted
  compaction stage cheap at 10^12 docs;
* per-block metadata: last_doc (skip targeting) and max tf-quality
  (``tf/(tf+k1*(1-b+b*dl/avgdl))``, float64) — multiplied by the term's
  ``idf*(k1+1)`` at query time this upper-bounds every score in the block
  (Block-Max WAND, Ding & Suel SIGIR'11).

Reference parity: the reference stores its index as an uncompressed JSON
tree (``/root/reference/pageindex/utils.py:354-400``); this format is the
from-scratch replacement mandated by BASELINE.json ``north_star`` ("delta-gap
+ varbyte-compressed docID/tf lists with block-max skip metadata").

Run row schema (Spark side, see spimi.py):
  term string, first_doc long, last_doc long, n_docs long,
  doc_blob binary, tf_blob binary,
  bm_last array<long>, bm_maxq array<double>,
  bm_doc_off array<int>, bm_tf_off array<int>, bm_ndocs array<int>
Offset arrays have len = n_blocks + 1 (end sentinel): block i's bytes are
``blob[off[i]:off[i+1]]``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .codec import BLOCK_SIZE, tf_quality, vb_decode, vb_encode


@dataclass
class Run:
    first_doc: int
    last_doc: int
    n_docs: int
    doc_blob: bytes
    tf_blob: bytes
    bm_last: np.ndarray  # int64 per block
    bm_maxq: np.ndarray  # float64 per block
    bm_doc_off: np.ndarray  # int32, n_blocks+1
    bm_tf_off: np.ndarray  # int32, n_blocks+1
    bm_ndocs: np.ndarray  # int32 per block

    @property
    def n_blocks(self) -> int:
        return len(self.bm_last)


def encode_run(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    doc_lens: np.ndarray,
    avgdl: float,
    block_size: int = BLOCK_SIZE,
) -> Run:
    """Sorted (doc_ids, tfs, doc_lens) -> block-aligned compressed Run."""
    d = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    t = np.ascontiguousarray(tfs, dtype=np.uint64)
    n = len(d)
    assert n > 0
    # Delta-gap with per-block reset: gap[i] = d[i]-d[i-1], except block
    # starts keep the absolute docID.
    gaps = np.empty(n, dtype=np.uint64)
    gaps[0] = d[0]
    np.subtract(d[1:], d[:-1], out=gaps[1:])
    starts = np.arange(0, n, block_size)
    gaps[starts] = d[starts]

    q = tf_quality(t, np.ascontiguousarray(doc_lens, dtype=np.float64), avgdl)
    ends = np.minimum(starts + block_size, n)
    bm_last = d[ends - 1].astype(np.int64)
    bm_maxq = np.maximum.reduceat(q, starts)
    bm_ndocs = (ends - starts).astype(np.int32)

    # Per-value byte widths -> per-block byte offsets without re-encoding.
    def _offsets(vals: np.ndarray) -> np.ndarray:
        nb = np.ones(len(vals), dtype=np.int64)
        for j in range(1, 10):
            nb += (vals >= np.uint64(1) << np.uint64(7 * j)).astype(np.int64)
        cum = np.concatenate(([0], np.cumsum(nb)))
        return cum[np.concatenate((starts, [n]))].astype(np.int32)

    return Run(
        first_doc=int(d[0]),
        last_doc=int(d[-1]),
        n_docs=n,
        doc_blob=vb_encode(gaps),
        tf_blob=vb_encode(t),
        bm_last=bm_last,
        bm_maxq=bm_maxq,
        bm_doc_off=_offsets(gaps),
        bm_tf_off=_offsets(t),
        bm_ndocs=bm_ndocs,
    )


def decode_block(run: Run, i: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode block i -> (doc_ids uint64, tfs uint64). Independent decode."""
    do, to = run.bm_doc_off, run.bm_tf_off
    gaps = vb_decode(run.doc_blob[do[i] : do[i + 1]])
    docs = np.cumsum(gaps, dtype=np.uint64)  # first gap is absolute
    tfs = vb_decode(run.tf_blob[to[i] : to[i + 1]])
    return docs, tfs


def block_starts(run: Run) -> np.ndarray:
    """Row index of each block's first posting (int64, len n_blocks)."""
    return np.concatenate(([0], np.cumsum(run.bm_ndocs, dtype=np.int64)[:-1]))


def decode_run(run: Run) -> tuple[np.ndarray, np.ndarray]:
    """Full decode -> (doc_ids, tfs). Vectorized: one cumsum over all gaps,
    then per-block carry correction (block starts hold absolute docIDs)."""
    gaps = vb_decode(run.doc_blob)
    tfs = vb_decode(run.tf_blob)
    starts = block_starts(run)
    docs = np.cumsum(gaps, dtype=np.uint64)
    if len(starts) > 1:
        # For element j in block b (b>0): true[j] = raw[j] - raw[start_b - 1],
        # because gaps[start_b] is the absolute docID and raw[start_b - 1]
        # already contains every earlier carry. Repeat each block's offset
        # over its length and subtract once.
        carry = docs[starts[1:] - 1]
        lens = run.bm_ndocs.astype(np.int64)
        fix = np.concatenate(
            (np.zeros(lens[0], dtype=np.uint64), np.repeat(carry, lens[1:]))
        )
        docs = docs - fix
    return docs, tfs


def first_doc_of_blob(doc_blob: bytes) -> int:
    """First encoded docID of a block-aligned blob (block starts are encoded
    ABSOLUTE, so the first varbyte value is the docID itself)."""
    end = 0
    while doc_blob[end] >= 128:
        end += 1
    return int(vb_decode(doc_blob[: end + 1])[0])


def split_run(run: Run, target_bytes: int) -> list[Run]:
    """Split an oversized run into block-aligned pieces of <= target_bytes
    each (a single block larger than the target still yields one piece).

    Reference parity: the recursive large-node split
    (``/root/reference/pageindex/page_index.py`` oversized-node re-split) —
    here a pure byte-slicing operation, valid because delta-gaps reset at
    every block boundary (each block is independently decodable). Pieces
    keep disjoint, ordered docID ranges, so downstream treats them exactly
    like separately-built runs. Zero decode except one varbyte value per
    piece (its absolute first docID).
    """
    total = len(run.doc_blob) + len(run.tf_blob)
    if total <= target_bytes or run.n_blocks <= 1:
        return [run]
    do, to = run.bm_doc_off, run.bm_tf_off
    pieces: list[Run] = []
    start = 0
    n = run.n_blocks
    while start < n:
        end = start + 1
        while end < n and (
            int(do[end + 1] - do[start]) + int(to[end + 1] - to[start])
        ) <= target_bytes:
            end += 1
        doc_blob = run.doc_blob[do[start] : do[end]]
        pieces.append(
            Run(
                first_doc=first_doc_of_blob(doc_blob),
                last_doc=int(run.bm_last[end - 1]),
                n_docs=int(run.bm_ndocs[start:end].sum()),
                doc_blob=doc_blob,
                tf_blob=run.tf_blob[to[start] : to[end]],
                bm_last=run.bm_last[start:end].copy(),
                bm_maxq=run.bm_maxq[start:end].copy(),
                bm_doc_off=(do[start : end + 1] - do[start]).astype(np.int32),
                bm_tf_off=(to[start : end + 1] - to[start]).astype(np.int32),
                bm_ndocs=run.bm_ndocs[start:end].copy(),
            )
        )
        start = end
    return pieces


def concat_runs(runs: list[Run]) -> Run:
    """Merge docID-disjoint ordered runs by pure concatenation (no decode).

    Valid because delta-gaps reset at block boundaries: every block is
    self-contained, so appending whole runs preserves decodability. Callers
    must pass runs sorted by first_doc with non-overlapping ranges (the
    SPIMI partition invariant); asserted cheaply via metadata.
    """
    if len(runs) == 1:
        return runs[0]
    for a, b in zip(runs, runs[1:]):
        assert a.last_doc < b.first_doc, "runs overlap — cannot concat-merge"
    doc_off_parts = [runs[0].bm_doc_off.astype(np.int64)]
    tf_off_parts = [runs[0].bm_tf_off.astype(np.int64)]
    for r in runs[1:]:
        doc_off_parts.append(r.bm_doc_off[1:].astype(np.int64) + doc_off_parts[-1][-1])
        tf_off_parts.append(r.bm_tf_off[1:].astype(np.int64) + tf_off_parts[-1][-1])
    return Run(
        first_doc=runs[0].first_doc,
        last_doc=runs[-1].last_doc,
        n_docs=sum(r.n_docs for r in runs),
        doc_blob=b"".join(r.doc_blob for r in runs),
        tf_blob=b"".join(r.tf_blob for r in runs),
        bm_last=np.concatenate([r.bm_last for r in runs]),
        bm_maxq=np.concatenate([r.bm_maxq for r in runs]),
        bm_doc_off=np.concatenate(doc_off_parts).astype(np.int32),
        bm_tf_off=np.concatenate(tf_off_parts).astype(np.int32),
        bm_ndocs=np.concatenate([r.bm_ndocs for r in runs]),
    )


def mask_run(run: Run, deleted_sorted: np.ndarray) -> Run | None:
    """Remove the docIDs in ``deleted_sorted`` (int64, ascending) from the
    run — the physical delete-application primitive (Lucene "expunge
    deletes"). Returns the run UNCHANGED (same object, zero decode) when no
    deleted docID falls in its range, ``None`` when every posting dies.

    Block boundaries are PRESERVED: untouched blocks pass through as byte
    slices; a touched block is decoded, filtered and re-encoded alone
    (blocks legitimately shrink below BLOCK_SIZE — ``bm_ndocs`` is
    per-block). This keeps the "posting blocks never span build-partition
    boundaries" invariant that query-time cell slicing relies on, and keeps
    the cost proportional to AFFECTED blocks, not run size. Surviving
    blocks keep their old ``bm_maxq``: the max quality over a SUBSET of a
    block's postings can only be <= the recorded value, so the Block-Max
    WAND bound stays valid (merely a touch loose) with no doc-length
    lookup needed.
    """
    lo = np.searchsorted(deleted_sorted, run.first_doc, side="left")
    hi = np.searchsorted(deleted_sorted, run.last_doc, side="right")
    if lo == hi:
        return run
    dead = deleted_sorted[lo:hi]
    do, to = run.bm_doc_off, run.bm_tf_off
    starts = block_starts(run)
    doc_parts: list[bytes] = []
    tf_parts: list[bytes] = []
    bm_last: list[int] = []
    bm_maxq: list[float] = []
    bm_ndocs: list[int] = []
    # Block b is touched iff some deleted id lies in [block_first, bm_last[b]].
    for b in range(run.n_blocks):
        blk_last = int(run.bm_last[b])
        blk_first = first_doc_of_blob(run.doc_blob[do[b] : do[b + 1]])
        a = np.searchsorted(dead, blk_first, side="left")
        z = np.searchsorted(dead, blk_last, side="right")
        if a == z:  # untouched: byte passthrough
            doc_parts.append(run.doc_blob[do[b] : do[b + 1]])
            tf_parts.append(run.tf_blob[to[b] : to[b + 1]])
            bm_last.append(blk_last)
            bm_maxq.append(float(run.bm_maxq[b]))
            bm_ndocs.append(int(run.bm_ndocs[b]))
        else:
            docs, tfs = decode_block(run, b)
            keep = ~np.isin(docs.astype(np.int64), dead, assume_unique=True)
            if not keep.any():
                continue  # whole block deleted
            d = docs[keep].astype(np.uint64)
            t = tfs[keep].astype(np.uint64)
            gaps = np.empty(len(d), dtype=np.uint64)
            gaps[0] = d[0]  # block start stays absolute
            np.subtract(d[1:], d[:-1], out=gaps[1:])
            doc_parts.append(vb_encode(gaps))
            tf_parts.append(vb_encode(t))
            bm_last.append(int(d[-1]))
            bm_maxq.append(float(run.bm_maxq[b]))  # still an upper bound
            bm_ndocs.append(len(d))
    if not bm_ndocs:
        return None
    doc_off = np.concatenate(
        ([0], np.cumsum([len(p) for p in doc_parts]))
    ).astype(np.int32)
    tf_off = np.concatenate(
        ([0], np.cumsum([len(p) for p in tf_parts]))
    ).astype(np.int32)
    doc_blob = b"".join(doc_parts)
    return Run(
        first_doc=first_doc_of_blob(doc_blob),
        last_doc=bm_last[-1],
        n_docs=int(np.sum(bm_ndocs)),
        doc_blob=doc_blob,
        tf_blob=b"".join(tf_parts),
        bm_last=np.asarray(bm_last, dtype=np.int64),
        bm_maxq=np.asarray(bm_maxq, dtype=np.float64),
        bm_doc_off=doc_off,
        bm_tf_off=tf_off,
        bm_ndocs=np.asarray(bm_ndocs, dtype=np.int32),
    )


def shift_run(run: Run, offset: int) -> Run:
    """Rebase every docID by ``+offset`` WITHOUT decoding postings — the
    index-merge primitive (``plans/merge.py``). Only each block's FIRST
    varint changes (block starts are encoded absolute; all later bytes are
    gaps, invariant under a uniform shift), so the work per run is
    n_blocks varint splices regardless of posting count. tf bytes, block
    quality bounds and per-block doc counts pass through untouched.
    ``offset == 0`` returns the SAME object (zero copy)."""
    if offset == 0:
        return run
    if offset < 0:
        raise ValueError("shift_run only rebases forward (offset >= 0)")
    off = np.uint64(offset)
    do = run.bm_doc_off
    parts: list[bytes] = []
    for b in range(run.n_blocks):
        blob = run.doc_blob[do[b] : do[b + 1]]
        end = 0  # first varint ends at the first byte with bit 7 clear
        while blob[end] >= 128:
            end += 1
        end += 1
        first = vb_decode(blob[:end])[0]
        parts.append(
            vb_encode(np.array([first + off], dtype=np.uint64)) + blob[end:]
        )
    doc_off = np.concatenate(
        ([0], np.cumsum([len(p) for p in parts]))
    ).astype(np.int32)
    return Run(
        first_doc=int(run.first_doc) + offset,
        last_doc=int(run.last_doc) + offset,
        n_docs=int(run.n_docs),
        doc_blob=b"".join(parts),
        tf_blob=run.tf_blob,
        bm_last=run.bm_last + np.int64(offset),
        bm_maxq=run.bm_maxq,
        bm_doc_off=doc_off,
        bm_tf_off=run.bm_tf_off,
        bm_ndocs=run.bm_ndocs,
    )
