"""Compaction merger streaming property: the carry-over merge across Arrow
batch boundaries must be byte-identical to a whole-partition merge.

Forcing ``spark.sql.execution.arrow.maxRecordsPerBatch=2`` makes every
(term, salt_group) group span MANY input batches inside ``merge_stream`` —
the exact condition the carry-over state handles. Any drift (split runs,
wrong run_id sequence, lost pending group at a boundary) shows up as a row
or blob mismatch vs the default-batch-size build.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pageindex_spark.operators.compaction import compact_segments
from pageindex_spark.operators.spimi import build_segments


@pytest.fixture(scope="module")
def segments(spark):
    rng = np.random.default_rng(7)
    vocab = [f"w{i:02d}" for i in range(12)]  # few terms -> big groups
    rows = [
        (did, int(did // 25), " ".join(rng.choice(vocab, size=30)))
        for did in range(200)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, part_id int, text string")
    segs = build_segments(docs, avgdl=30.0)
    segs.cache().count()
    return segs


def _collect_runs(df):
    rows = df.select(
        "term", "run_id", "first_doc", "last_doc", "n_docs", "doc_blob", "tf_blob",
        "bm_last", "bm_doc_off", "bm_ndocs",
    ).collect()
    return sorted(
        (
            r["term"], r["run_id"], r["first_doc"], r["last_doc"], r["n_docs"],
            bytes(r["doc_blob"]), bytes(r["tf_blob"]),
            tuple(r["bm_last"]), tuple(r["bm_doc_off"]), tuple(r["bm_ndocs"]),
        )
        for r in rows
    )


def test_merge_identical_across_arrow_batch_sizes(spark, segments):
    conf_key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(conf_key)
    # small target_run_bytes so heavy groups emit multiple runs too
    whole = _collect_runs(compact_segments(segments, target_run_bytes=4096))
    try:
        spark.conf.set(conf_key, "2")
        tiny = _collect_runs(compact_segments(segments, target_run_bytes=4096))
    finally:
        spark.conf.set(conf_key, old)
    assert tiny == whole
    # sanity: every term produced a run and each group (8 segment rows)
    # spanned >= 4 two-row input batches under the tiny setting
    assert len(whole) >= 12


def test_fold_light_runs_collapses_long_tail(spark, segments):
    """Second-level compaction: salted-then-folded == direct unsalted merge
    (blob-identical), every light term ends at exactly 1 run, heavy terms
    keep their salted runs untouched."""
    from pageindex_spark.operators.compaction import fold_light_runs

    salted = compact_segments(segments, target_run_bytes=4096, parts_per_group=2)
    salted.cache().count()
    folded = fold_light_runs(salted, target_run_bytes=1 << 20)
    per_term = folded.groupBy("term").count().collect()
    assert per_term and all(r["count"] == 1 for r in per_term)
    # zero-decode concat preserves posting bytes exactly
    tot = lambda df: df.agg(F.sum("n_bytes").alias("b")).collect()[0]["b"]
    assert tot(folded) == tot(salted)
    # folded output == a direct single-group merge of the same segments
    direct = compact_segments(
        segments, target_run_bytes=1 << 20, parts_per_group=64
    )
    assert _collect_runs(folded) == _collect_runs(direct)
    # heavy terms (total > target) pass through byte-identical
    tiny_fold = fold_light_runs(salted, target_run_bytes=1)
    assert _collect_runs(tiny_fold) == _collect_runs(salted)
    salted.unpersist()
