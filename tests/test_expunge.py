"""Batch-index expunge: journaled swap, crash redo, stats re-tighten.

Pins ``plans/expunge.py``: expunging a batch-built index physically removes
tombstoned docs and is rank+score IDENTICAL to a fresh build over the
surviving corpus (df/avgdl/n_docs exact again); the swap is journaled so a
crash at ANY point either leaves the old index fully intact (pre-journal)
or is redone to completion by the next reader (post-journal); and the
block-max bound stays valid when the expunge GROWS avgdl (the bound_scale
inflation) — pinned by bmw == dense identity after deleting only the
shortest docs.
"""

import json
import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from pageindex_spark import build_index
from pageindex_spark.plans.deletes import delete_docs
from pageindex_spark.plans.expunge import JOURNAL, expunge_index, recover_expunge
from pageindex_spark.plans.query import search
from pageindex_spark.sources.corpus import make_documents, make_queries
from pageindex_spark.sources.tables import read_meta

BASE = "/root/repo/data/expunge-test"


def _build(spark, out, rows):
    df = spark.createDataFrame(rows, "url string, text string")
    build_index(
        spark, df, out,
        num_partitions=4, n_buckets=8, n_seg_chunks=1, n_bucket_chunks=1,
    )
    return out


@pytest.fixture(scope="module")
def corpus():
    docs = make_documents(240, seed=23)
    return list(zip(docs.url, docs.text))


@pytest.fixture(scope="module")
def expunged(spark, corpus):
    """Build -> delete 3 winners -> expunge, shared by the identity tests."""
    shutil.rmtree(BASE, ignore_errors=True)
    idx = _build(spark, f"{BASE}/index", corpus)
    queries = make_queries()[:8]
    full = search(spark, idx, queries, k=20).collect()
    dead = sorted({r["url"] for r in full if r["rank"] <= 2})[:3]
    delete_docs(spark, idx, dead)
    meta = expunge_index(spark, idx)
    yield {
        "idx": idx, "queries": queries, "dead": dead, "meta": meta,
        "full": full,
    }
    shutil.rmtree(BASE, ignore_errors=True)


def test_expunge_matches_fresh_build(spark, corpus, expunged):
    """Post-expunge state: tombstones cleared, dead text rows gone, live
    postings only, stats over survivors, and search rank+score identical
    to a from-scratch build of the surviving corpus."""
    from pageindex_spark.operators.compaction import run_from_row
    from pageindex_spark.operators.runfmt import decode_run

    d = expunged
    meta = read_meta(d["idx"])
    assert "deletes" not in meta
    assert not os.path.exists(os.path.join(d["idx"], JOURNAL))
    assert not os.path.isdir(os.path.join(d["idx"], "tombstones"))
    assert meta["n_slots"] == 240 and meta["n_docs"] == 237
    ext = spark.read.parquet(os.path.join(d["idx"], "docs_extracted"))
    assert ext.filter(F.col("url").isin(d["dead"])).count() == 0
    offs = {p: int(g) for p, g in enumerate(meta["grid"])}
    live = {
        offs[int(r["part_id"])] + int(r["local_pos"])
        for r in ext.select("part_id", "local_pos").collect()
    }
    runs = spark.read.parquet(os.path.join(d["idx"], "postings")).collect()
    alldocs = np.concatenate(
        [decode_run(run_from_row(r.asDict()))[0].astype(np.int64) for r in runs]
    )
    assert set(alldocs.tolist()) <= live

    got = search(spark, d["idx"], d["queries"], k=20).collect()
    assert not ({r["url"] for r in got} & set(d["dead"]))
    surv = [(u, t) for u, t in corpus if u not in set(d["dead"])]
    idx2 = _build(spark, f"{BASE}/fresh", surv)
    want = search(spark, idx2, d["queries"], k=20).collect()
    key = lambda rows: sorted(
        (r["query_id"], r["rank"], r["url"], round(r["score"], 9)) for r in rows
    )
    assert key(got) == key(want)


def test_expunge_noop_and_post_delete_cycle(spark, corpus, expunged):
    """Expunge without tombstones is a no-op; a second delete->expunge
    cycle on the already-expunged index works (n_slots stays at the
    original positional space)."""
    d = expunged
    before = read_meta(d["idx"])
    assert expunge_index(spark, d["idx"]) == before
    full = search(spark, d["idx"], d["queries"], k=20).collect()
    dead2 = sorted({r["url"] for r in full if r["rank"] == 1})[:2]
    delete_docs(spark, d["idx"], dead2)
    meta = expunge_index(spark, d["idx"])
    assert meta["n_slots"] == 240 and meta["n_docs"] == 235
    got = search(spark, d["idx"], d["queries"], k=20).collect()
    assert not ({r["url"] for r in got} & set(dead2))


def test_crash_before_journal_leaves_old_index_intact(spark, corpus, monkeypatch):
    """A crash anywhere in phase 1 (tmp writes) must leave the committed
    index byte-identical and still serving exact MASKED results; the next
    expunge GCs the orphan tmp and completes."""
    shutil.rmtree(f"{BASE}/crash1", ignore_errors=True)
    idx = _build(spark, f"{BASE}/crash1", corpus[:120])
    queries = make_queries()[:4]
    full = search(spark, idx, queries, k=10).collect()
    dead = sorted({r["url"] for r in full if r["rank"] == 1})[:2]
    delete_docs(spark, idx, dead)
    masked = search(spark, idx, queries, k=10).collect()

    import pageindex_spark.plans.expunge as pex

    def boom(*a, **k):
        raise RuntimeError("crash mid phase 1")

    monkeypatch.setattr(pex, "term_stats_from_runs", boom)
    with pytest.raises(RuntimeError):
        expunge_index(spark, idx)
    monkeypatch.undo()
    meta = read_meta(idx)
    assert meta["deletes"]["n_deleted"] == 2  # delete still committed
    assert not os.path.exists(os.path.join(idx, JOURNAL))
    again = search(spark, idx, queries, k=10).collect()
    assert {tuple(r) for r in again} == {tuple(r) for r in masked}
    expunge_index(spark, idx)  # orphan tmp GC'd, completes cleanly
    assert "deletes" not in read_meta(idx)
    assert not ({r["url"] for r in search(spark, idx, queries, k=10).collect()}
                & set(dead))
    shutil.rmtree(f"{BASE}/crash1", ignore_errors=True)


def test_crash_after_journal_is_redone_by_reader(spark, corpus, monkeypatch):
    """A crash AFTER the journal commit (mid-swap: postings already
    renamed, term_stats/docs/meta not yet) must be redone by the next
    Searcher open — results identical to an uninterrupted expunge."""
    shutil.rmtree(f"{BASE}/crash2", ignore_errors=True)
    idx = _build(spark, f"{BASE}/crash2", corpus[:120])
    queries = make_queries()[:4]
    full = search(spark, idx, queries, k=10).collect()
    dead = sorted({r["url"] for r in full if r["rank"] == 1})[:2]
    delete_docs(spark, idx, dead)

    import pageindex_spark.plans.expunge as pex

    real_apply = pex._apply_swap

    def crash_mid_swap(index_dir, journal):
        # swap ONE relation for real, then die before meta/journal cleanup
        tmp = os.path.join(index_dir, pex.TMP_DIRNAME, "postings")
        final = os.path.join(index_dir, "postings")
        shutil.rmtree(final, ignore_errors=True)
        os.rename(tmp, final)
        raise RuntimeError("crash mid phase 3")

    monkeypatch.setattr(pex, "_apply_swap", crash_mid_swap)
    with pytest.raises(RuntimeError):
        expunge_index(spark, idx)
    monkeypatch.undo()
    # journal is committed; old meta still has the deletes recorded
    assert os.path.exists(os.path.join(idx, JOURNAL))
    assert "deletes" in read_meta(idx)
    with open(os.path.join(idx, JOURNAL)) as f:
        assert json.load(f)["relations"] == ["postings", "term_stats",
                                             "docs_extracted"]
    # any reader path completes the swap (search -> Searcher -> recover)
    got = search(spark, idx, queries, k=10).collect()
    meta = read_meta(idx)
    assert "deletes" not in meta and meta["n_docs"] == 118
    assert not os.path.exists(os.path.join(idx, JOURNAL))
    assert not ({r["url"] for r in got} & set(dead))
    assert recover_expunge(idx) is False  # nothing left to redo
    # identical to an uninterrupted expunge over the same corpus+deletes
    idx2 = _build(spark, f"{BASE}/crash2b", corpus[:120])
    delete_docs(spark, idx2, dead)
    expunge_index(spark, idx2)
    want = search(spark, idx2, queries, k=10).collect()
    key = lambda rows: sorted(
        (r["query_id"], r["rank"], r["url"], round(r["score"], 9)) for r in rows
    )
    assert key(got) == key(want)
    shutil.rmtree(f"{BASE}/crash2", ignore_errors=True)
    shutil.rmtree(f"{BASE}/crash2b", ignore_errors=True)


def test_bound_scale_keeps_bmw_exact_when_avgdl_grows(spark):
    """Delete ONLY the shortest docs so the survivor avgdl GROWS past the
    build avgdl the committed bm_maxq bounds were computed with. Without
    the bound_scale inflation BMW could prune true winners; with it, bmw
    must equal exhaustive dense scoring exactly."""
    shutil.rmtree(f"{BASE}/scale", ignore_errors=True)
    # Bimodal corpus: tiny docs + long docs sharing the query term, so
    # dropping every tiny doc moves avgdl a lot.
    rng = np.random.default_rng(5)
    filler = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rows = []
    for i in range(120):
        short = i % 2 == 0
        n = 3 if short else 80
        words = ["needle"] + list(rng.choice(filler, size=n - 1))
        rows.append((f"{i:04d}", " ".join(words)))
    idx = _build(spark, f"{BASE}/scale", rows)
    meta0 = read_meta(idx)
    dead = [u for u, _ in rows if int(u) % 2 == 0]
    delete_docs(spark, idx, dead)
    expunge_index(spark, idx)
    meta = read_meta(idx)
    assert meta["avgdl"] > meta0["avgdl"] * 1.5  # bounds are genuinely stale
    assert meta["bound_avgdl"] == pytest.approx(meta0["avgdl"])
    queries = [(0, "needle alpha"), (1, "needle zeta beta"), (2, "needle")]
    bmw = search(spark, idx, queries, k=15, mode="bmw").collect()
    dense = search(spark, idx, queries, k=15, mode="dense").collect()
    key = lambda rows: sorted(
        (r["query_id"], r["rank"], r["url"], round(r["score"], 9)) for r in rows
    )
    assert key(bmw) == key(dense)
    assert not ({r["url"] for r in bmw} & set(dead))
    shutil.rmtree(f"{BASE}/scale", ignore_errors=True)
