"""Property tests for the posting-list codec (SURVEY.md §5.2(3))."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pageindex_spark.operators.codec import (
    block_max,
    decode_postings,
    delta_decode,
    delta_encode,
    encode_postings,
    tf_quality,
    vb_decode,
    vb_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(vb_decode(vb_encode(arr)), arr)


def test_varbyte_known_values():
    # Single-byte values encode as themselves.
    assert vb_encode(np.array([0, 1, 127], dtype=np.uint64)) == b"\x00\x01\x7f"
    # 128 -> 0x80 0x01 (LE 7-bit groups, continuation on first byte).
    assert vb_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    # 10^12-docID-scale values round-trip (north rule scale).
    big = np.array([10**12, 2**63 - 1], dtype=np.uint64)
    assert np.array_equal(vb_decode(vb_encode(big)), big)


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=400, unique=True)
)
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip_strictly_increasing(vals):
    arr = np.array(sorted(vals), dtype=np.uint64)
    gaps = delta_encode(arr)
    assert (gaps[1:] > 0).all()  # strictly increasing input -> positive gaps
    assert np.array_equal(delta_decode(gaps), arr)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.integers(min_value=1, max_value=1000),
            st.integers(min_value=1, max_value=5000),
        ),
        min_size=1,
        max_size=600,
    )
)
@settings(max_examples=100, deadline=None)
def test_postings_roundtrip_and_blockmax_upper_bound(rows):
    uniq = {}
    for did, tf, dl in rows:
        uniq[did] = (tf, dl)
    doc_ids = np.array(sorted(uniq), dtype=np.uint64)
    tfs = np.array([uniq[d][0] for d in sorted(uniq)], dtype=np.uint64)
    dls = np.array([uniq[d][1] for d in sorted(uniq)], dtype=np.uint64)
    avgdl = float(dls.mean())

    dblob, tblob = encode_postings(doc_ids, tfs)
    d2, t2 = decode_postings(dblob, tblob)
    assert np.array_equal(d2, doc_ids) and np.array_equal(t2, tfs)

    last, mx = block_max(doc_ids, tfs, dls, avgdl, block_size=64)
    q = tf_quality(tfs, dls, avgdl)
    # every true per-doc quality is <= its block's recorded max
    blk = np.searchsorted(last, doc_ids, side="left")
    assert (q <= mx[blk] + 1e-15).all()
    assert last[-1] == doc_ids[-1]


def test_compression_ratio_on_dense_lists():
    # Dense heavy-hitter posting list: gaps ~1 -> ~1 byte/doc vs 8 raw.
    doc_ids = np.arange(0, 100_000, 2, dtype=np.uint64)
    blob = vb_encode(delta_encode(doc_ids))
    assert len(blob) < 1.1 * len(doc_ids)
