"""Positional sidecar: exact-phrase identity, beyond-cap exactness,
tombstone masking, staleness/auto-routing.

Pins ``plans/positions.py``: the sidecar phrase path is rank+score
identical to the pure-Python phrase oracle AND to the text-verify path
where both are exact; it stays exact where the text path's ``cand_cap``
truncates; tombstoned docs never match; and corpus-rewriting mutations
invalidate the sidecar (auto-fallback to the text path) until a rebuild.
"""

import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from pageindex_spark import build_index
from pageindex_spark.oracle import phrase_topk
from pageindex_spark.plans.positions import (
    build_positions_sidecar,
    sidecar_ready,
)
from pageindex_spark.plans.query import search_phrase
from pageindex_spark.sources.corpus import make_documents
from pageindex_spark.sources.tables import read_meta

BASE = "/root/repo/data/positions-test"


@pytest.fixture(scope="module")
def pos_index(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    docs = make_documents(240, seed=41)
    rows = sorted(zip(docs.url, docs.text))
    df = spark.createDataFrame(rows, "url string, text string")
    idx = f"{BASE}/index"
    build_index(
        spark, df, idx,
        num_partitions=4, n_buckets=8, n_seg_chunks=1, n_bucket_chunks=1,
    )
    build_positions_sidecar(spark, idx)
    yield {"idx": idx, "rows": rows}
    shutil.rmtree(BASE, ignore_errors=True)


def _phrases(rows):
    t0 = rows[0][1].split()
    return [
        (1, f"{t0[0]} {t0[1]}"),          # planted bigram
        (2, f"{t0[4]} {t0[5]} {t0[6]}"),  # planted trigram
        (3, t0[2]),                        # single-term phrase
        (4, f"{t0[3]} {t0[0]}"),          # order flip: may or may not occur
        (5, "zzzabsent zzzmissing"),       # absent terms -> empty
    ]


def _key(rows):
    return sorted(
        (r["query_id"], r["rank"], r["url"], round(r["score"], 9)) for r in rows
    )


def test_positions_identity_vs_oracle_and_text_path(spark, pos_index):
    d = pos_index
    phrases = _phrases(d["rows"])
    want = phrase_topk(d["rows"], phrases, k=10)
    got = search_phrase(
        spark, d["idx"], phrases, k=10, use_positions=True
    ).collect()
    assert _key(got) == sorted(
        (q, r, u, round(s, 9)) for q, r, u, s in want
    )
    # auto-detect routes to the sidecar and agrees with the text path
    auto = search_phrase(spark, d["idx"], phrases, k=10).collect()
    txt = search_phrase(
        spark, d["idx"], phrases, k=10, use_positions=False
    ).collect()
    assert _key(auto) == _key(got) == _key(txt)
    assert not [r for r in got if r["query_id"] == 5]


def test_near_slop_identity_both_paths(spark, pos_index):
    """Proximity / NEAR (round 5, search_phrase slop=N): ordered window
    match — positions p_0 < ... < p_{n-1}, span <= slop + n - 1. Both
    verification paths (sidecar greedy chain, codegen'd windowed text
    predicate) must reproduce the pure-Python window-subsequence oracle at
    several slops, including a trigram; slop=0 equals the exact phrase
    path; slop must visibly widen the match set; negative slop raises."""
    d = pos_index
    t0 = d["rows"][0][1].split()
    # skip-gram probes: term pairs/triples at distance 2-3 in a real doc,
    # which exact phrase misses but slop>=1 catches.
    probes = [
        (1, f"{t0[0]} {t0[2]}"),
        (2, f"{t0[1]} {t0[4]}"),
        (3, f"{t0[0]} {t0[2]} {t0[4]}"),
        (4, f"{t0[5]} {t0[3]}"),
        (5, "zzzabsent zzzmissing"),
    ]
    for slop in (0, 1, 2, 4):
        want = sorted(
            (q, r, u, round(s, 9))
            for q, r, u, s in phrase_topk(d["rows"], probes, k=10, slop=slop)
        )
        got_pos = search_phrase(
            spark, d["idx"], probes, k=10, use_positions=True, slop=slop
        ).collect()
        got_txt = search_phrase(
            spark, d["idx"], probes, k=10, use_positions=False, slop=slop
        ).collect()
        assert _key(got_pos) == want, f"sidecar path, slop={slop}"
        assert _key(got_txt) == want, f"text path, slop={slop}"
    n0 = len(phrase_topk(d["rows"], probes, k=100, slop=0))
    n2 = len(phrase_topk(d["rows"], probes, k=100, slop=2))
    assert n2 > n0  # the slop visibly widened matching
    with pytest.raises(ValueError):
        search_phrase(spark, d["idx"], probes, k=10, slop=-1)


def test_near_unordered_identity_both_paths(spark, pos_index):
    """Unordered NEAR (round 5, search_phrase in_order=False): all distinct
    terms inside any slop+n window, any order. Both verification paths
    must reproduce the pure-Python anchored-window oracle at several
    slops incl. a trigram and REVERSED pairs (which ordered NEAR misses);
    the unordered match set contains the ordered one; duplicate terms
    raise."""
    d = pos_index
    t0 = d["rows"][0][1].split()
    probes = [
        (1, f"{t0[2]} {t0[0]}"),  # reversed adjacent pair
        (2, f"{t0[4]} {t0[1]}"),  # reversed, distance 3
        (3, f"{t0[4]} {t0[2]} {t0[0]}"),  # reversed trigram
        (4, f"{t0[0]} {t0[2]}"),  # forward (ordered also matches)
        (5, "zzzabsent zzzmissing"),
    ]
    for slop in (0, 1, 2, 4):
        want = sorted(
            (q, r, u, round(s, 9))
            for q, r, u, s in phrase_topk(
                d["rows"], probes, k=10, slop=slop, in_order=False
            )
        )
        got_pos = search_phrase(
            spark, d["idx"], probes, k=10, use_positions=True, slop=slop,
            in_order=False,
        ).collect()
        got_txt = search_phrase(
            spark, d["idx"], probes, k=10, use_positions=False, slop=slop,
            in_order=False,
        ).collect()
        assert _key(got_pos) == want, f"sidecar path, slop={slop}"
        assert _key(got_txt) == want, f"text path, slop={slop}"
        # unordered is a superset of ordered at the same slop
        n_ord = len(phrase_topk(d["rows"], probes, k=100, slop=slop))
        n_unord = len(
            phrase_topk(d["rows"], probes, k=100, slop=slop, in_order=False)
        )
        assert n_unord >= n_ord
    # the reversed probes only match unordered: ordered NEAR at slop=2
    # finds nothing for query 3's reversed trigram
    ord3 = [
        r
        for r in phrase_topk(d["rows"], probes[2:3], k=100, slop=2)
    ]
    unord3 = [
        r
        for r in phrase_topk(
            d["rows"], probes[2:3], k=100, slop=2, in_order=False
        )
    ]
    assert len(unord3) > len(ord3)
    with pytest.raises(ValueError):
        search_phrase(
            spark, d["idx"], [(1, f"{t0[0]} {t0[0]}")], in_order=False
        )


def test_positions_exact_beyond_cand_cap(spark, tmp_path):
    """An all-common-terms phrase whose conjunctive candidate set exceeds
    cand_cap: the text path truncates recall at the cap, the sidecar path
    returns every match."""
    rows = [
        (f"u{i:04d}", f"alpha beta filler{i} tail{i % 7}") for i in range(60)
    ] + [(f"v{i:04d}", f"beta alpha other{i}") for i in range(20)]
    idx = str(tmp_path / "idx")
    build_index(
        spark,
        spark.createDataFrame(sorted(rows), "url string, text string"),
        idx,
        num_partitions=4, n_buckets=4, n_seg_chunks=1, n_bucket_chunks=1,
    )
    build_positions_sidecar(spark, idx)
    phrases = [(1, "alpha beta")]
    got = search_phrase(
        spark, idx, phrases, k=100, use_positions=True
    ).collect()
    assert len(got) == 60  # every true match, no cap
    capped = search_phrase(
        spark, idx, phrases, k=100, cand_cap=5, use_positions=False
    ).collect()
    assert len(capped) <= 5  # the documented truncation the sidecar removes
    want = phrase_topk(sorted(rows), phrases, k=100)
    assert _key(got) == sorted((q, r, u, round(s, 9)) for q, r, u, s in want)


def test_positions_masks_tombstones(spark, pos_index):
    from pageindex_spark.plans.deletes import delete_docs

    d = pos_index
    phrases = _phrases(d["rows"])[:1]
    before = search_phrase(
        spark, d["idx"], phrases, k=10, use_positions=True
    ).collect()
    assert before
    dead = before[0]["url"]
    delete_docs(spark, d["idx"], [dead])
    after = search_phrase(
        spark, d["idx"], phrases, k=10, use_positions=True
    ).collect()
    assert dead not in {r["url"] for r in after}
    surv = [(u, t) for u, t in d["rows"] if u != dead]
    # stale-stats masking: survivors keep full-corpus scores, so compare
    # urls/ranks only (score identity after rewrite is the expunge test)
    want = [(q, r, u) for q, r, u, _ in phrase_topk(surv, phrases, k=10)]
    assert sorted((r["query_id"], r["rank"], r["url"]) for r in after) == sorted(
        want
    )


def test_expunge_invalidates_sidecar_and_fallback(spark, pos_index):
    """Corpus rewrite (expunge of the tombstone from the previous test)
    drops the sidecar; search_phrase auto-falls back to the text path and
    stays correct; a rebuild re-enables the sidecar."""
    from pageindex_spark.plans.expunge import expunge_index

    d = pos_index
    expunge_index(spark, d["idx"])
    meta = read_meta(d["idx"])
    assert "positions" not in meta
    assert not os.path.isdir(os.path.join(d["idx"], "positions"))
    assert not sidecar_ready(meta, d["idx"])
    phrases = _phrases(d["rows"])[:2]
    surv_urls = None  # recompute surviving corpus from disk
    ext = spark.read.parquet(os.path.join(d["idx"], "docs_extracted"))
    surv_urls = {r["url"] for r in ext.select("url").collect()}
    surv = [(u, t) for u, t in d["rows"] if u in surv_urls]
    got = search_phrase(spark, d["idx"], phrases, k=10).collect()  # fallback
    want = phrase_topk(surv, phrases, k=10)
    assert _key(got) == sorted((q, r, u, round(s, 9)) for q, r, u, s in want)
    build_positions_sidecar(spark, d["idx"])
    assert sidecar_ready(read_meta(d["idx"]), d["idx"])
    got2 = search_phrase(spark, d["idx"], phrases, k=10).collect()  # sidecar
    assert _key(got2) == _key(got)
