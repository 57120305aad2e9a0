"""Index merge: multi-source identity, expunged-source slots, rejections.

Pins ``plans/merge.py``: a merge of url-range-ordered shards is rank+score
IDENTICAL to a from-scratch build over the concatenated corpus (stats
re-derived exactly, docIDs rebased by varint splice — never decoded), an
EXPUNGED source merges correctly through its dead slots (n_slots offsets,
bound_avgdl carry), and unsound inputs (pending tombstones, streamed
layout, < 2 sources) are rejected loudly.
"""

import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from pageindex_spark import build_index, search
from pageindex_spark.oracle import bm25_topk
from pageindex_spark.plans.deletes import delete_docs
from pageindex_spark.plans.expunge import expunge_index
from pageindex_spark.plans.merge import merge_indexes
from pageindex_spark.sources.corpus import make_documents, make_queries
from pageindex_spark.sources.tables import read_meta

BASE = "/root/repo/data/merge-test"


def _build(spark, out, rows):
    df = spark.createDataFrame(rows, "url string, text string")
    build_index(
        spark, df, out,
        num_partitions=4, n_buckets=8, n_seg_chunks=1, n_bucket_chunks=1,
    )
    return out


@pytest.fixture(scope="module")
def shards(spark):
    """Three url-range-ordered shards over one 300-doc corpus."""
    shutil.rmtree(BASE, ignore_errors=True)
    docs = make_documents(300, seed=31)
    rows = sorted(zip(docs.url, docs.text))
    parts = [rows[:100], rows[100:200], rows[200:]]
    dirs = [_build(spark, f"{BASE}/s{i}", p) for i, p in enumerate(parts)]
    yield {"rows": rows, "parts": parts, "dirs": dirs}
    shutil.rmtree(BASE, ignore_errors=True)


def _assert_matches_golden(got_rows, golden):
    assert len(got_rows) == len(golden)
    for g, (qid, rank, url, score) in zip(got_rows, golden):
        assert (g["query_id"], g["rank"], g["url"]) == (qid, rank, url)
        assert abs(g["score"] - score) < 1e-9


def test_three_way_merge_matches_fresh_build(spark, shards):
    """merge(A, B, C) == from-scratch build of A+B+C: rank AND score
    identity vs the pure-Python golden, plus exact meta stats and
    docID-disjoint grids."""
    out = f"{BASE}/merged"
    merge_indexes(spark, shards["dirs"], out)
    meta = read_meta(out)
    assert meta["n_docs"] == 300 and meta["n_slots"] == 300
    assert meta["grid"] == sorted(meta["grid"]) and len(meta["grid"]) == 12
    queries = make_queries()[:8]
    got = search(spark, out, queries, k=20).collect()
    _assert_matches_golden(got, bm25_topk(shards["rows"], queries, k=20))
    # df re-derivation: merged postings n_docs sum == golden oracle df
    from pageindex_spark.oracle.bm25 import OracleIndex

    oi = OracleIndex(shards["rows"])
    ts = spark.read.parquet(os.path.join(out, "term_stats"))
    some = {
        r["term"]: int(r["df"])
        for r in ts.orderBy(F.desc("df"), "term").limit(20).collect()
    }
    for t, df in some.items():
        assert df == len(oi.postings[t])


def test_merge_with_expunged_source(spark, shards):
    """An expunged shard (dead slots: n_slots > n_docs) merges correctly:
    later sources rebase by SLOTS, stats count survivors only, results
    equal the golden over the surviving corpus."""
    a2 = f"{BASE}/s0_exp"
    shutil.copytree(shards["dirs"][0], a2)
    dead = [u for u, _ in shards["parts"][0][:3]]
    delete_docs(spark, a2, dead)
    with pytest.raises(ValueError, match="tombstones"):
        merge_indexes(spark, [a2, shards["dirs"][1]], f"{BASE}/never")
    expunge_index(spark, a2)
    assert read_meta(a2)["n_slots"] == 100 and read_meta(a2)["n_docs"] == 97
    out = f"{BASE}/merged_exp"
    merge_indexes(spark, [a2, shards["dirs"][1], shards["dirs"][2]], out)
    meta = read_meta(out)
    assert meta["n_docs"] == 297 and meta["n_slots"] == 300
    surv = [(u, t) for u, t in shards["rows"] if u not in set(dead)]
    queries = make_queries()[:8]
    got = search(spark, out, queries, k=20).collect()
    _assert_matches_golden(got, bm25_topk(surv, queries, k=20))
    assert not ({r["url"] for r in got} & set(dead))


def test_merge_rejections(spark, shards):
    with pytest.raises(ValueError, match="at least two"):
        merge_indexes(spark, shards["dirs"][:1], f"{BASE}/never")
    # streamed layout is owned by the streaming lifecycle
    fake = f"{BASE}/s0_streamed"
    shutil.copytree(shards["dirs"][0], fake)
    import json

    mp = os.path.join(fake, "meta.json")
    with open(mp) as f:
        m = json.load(f)
    m["streamed"] = {"batches": [0], "deltas": [0], "p_per_batch": 4}
    with open(mp, "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="streamed"):
        merge_indexes(spark, [fake, shards["dirs"][1]], f"{BASE}/never")


def test_shift_run_unit():
    """Zero-decode docID rebase: decode(shift(run, off)) == docs + off,
    tf bytes and block metadata untouched, offset 0 is the same object."""
    from pageindex_spark.operators.runfmt import (
        decode_run,
        encode_run,
        shift_run,
    )

    rng = np.random.default_rng(5)
    docs = np.sort(rng.choice(80_000, size=4_000, replace=False)).astype(
        np.int64
    )
    tfs = rng.integers(1, 40, size=4_000).astype(np.int64)
    dls = rng.integers(5, 350, size=4_000).astype(np.float64)
    run = encode_run(docs, tfs, dls, avgdl=110.0)
    assert shift_run(run, 0) is run
    for off in (1, 127, 128, 10**7):
        s = shift_run(run, off)
        d2, t2 = decode_run(s)
        assert np.array_equal(d2.astype(np.int64), docs + off)
        assert np.array_equal(t2.astype(np.int64), tfs)
        assert s.tf_blob is run.tf_blob  # tf bytes pass through untouched
        assert np.array_equal(s.bm_maxq, run.bm_maxq)
        assert np.array_equal(s.bm_ndocs, run.bm_ndocs)
        assert s.bm_doc_off[-1] == len(s.doc_blob)
        assert s.first_doc == int(docs[0]) + off
        assert s.last_doc == int(docs[-1]) + off
    with pytest.raises(ValueError):
        shift_run(run, -1)
