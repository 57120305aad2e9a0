"""Training-data pipeline operators (DataFrame API): consistency with the
SQL-verified twins + semantic sanity (LSH recall, multimodal plumbing)."""

import os

import pytest
from pyspark.sql import functions as F

from pageindex_spark.driverq import paired_sql, register_views

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_ops_match_sql_twins(spark, docs):
    """DataFrame-API operators == the SQL strings the driver verifies."""
    from pageindex_spark.operators.dedup import exact_groups
    from pageindex_spark.operators.textstats import fingerprint, lang_id, quality_score

    register_views(spark, SF_DIR)
    sqls = paired_sql()
    assert _rows(fingerprint(docs)) == _rows(spark.sql(sqls["fingerprint"][0]))
    assert _rows(lang_id(docs)) == _rows(spark.sql(sqls["lang_id"][0]))
    assert _rows(quality_score(docs)) == _rows(spark.sql(sqls["quality_score"][0]))
    assert _rows(exact_groups(docs)) == _rows(spark.sql(sqls["dedup_exact"][0]))


def test_dedup_ops_survive_short_docs(spark, docs):
    """Regression (round-1 verdict): docs with < 3 tokens crashed the
    DataFrame shingle path (sequence(0, size-3) -> negative array index).
    The DataFrame ops must return the SQL-twin result on a corpus that mixes
    empty / 1-token / 2-token docs with normal ones."""
    from pageindex_spark.driverq import paired_sql
    from pageindex_spark.operators.dedup import (
        lsh_candidates,
        minhash_signatures,
        ngram_jaccard_pairs,
    )

    real = [
        (10 + i, r["text"])
        for i, r in enumerate(docs.select("text").limit(6).collect())
    ]
    short = [(1, ""), (2, "one"), (3, "one two"), (4, "  "), (5, "x y")]
    # duplicate a real doc so lsh_candidates has a bucket with > 1 member
    corpus = spark.createDataFrame(
        short + real + [(20, real[0][1])], "doc_id long, text string"
    )
    corpus.createOrReplaceTempView("documents")
    sqls = paired_sql()
    assert _rows(minhash_signatures(corpus)) == _rows(
        spark.sql(sqls["minhash_signatures"][0])
    )
    assert _rows(lsh_candidates(corpus)) == _rows(spark.sql(sqls["lsh_candidates"][0]))
    jac = _rows(ngram_jaccard_pairs(corpus, max_key=40))
    assert jac == _rows(spark.sql(sqls["ngram_jaccard"][0]))
    # real pairs survived; short docs never appear on either side
    assert jac and all(r[0] >= 10 and r[1] >= 10 for r in jac)
    spark.catalog.dropTempView("documents")


def test_simhash_near_duplicates_close(spark, docs):
    """SimHash of a doc and a lightly perturbed copy differ in few bits;
    unrelated docs differ in many."""
    from pageindex_spark.operators.dedup import simhash64

    base = docs.filter(F.col("doc_id") < 30).select("doc_id", "text")
    # perturbed copy: append one token (ids shifted by 10000)
    pert = base.select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat("text", F.lit(" extra")).alias("text"),
    )
    sh = {r["doc_id"]: r["simhash"] for r in simhash64(base.unionByName(pert), bits=16).collect()}
    close, far = [], []
    for d in range(30):
        ham_same = bin(sh[d] ^ sh[d + 10000]).count("1")
        close.append(ham_same)
        other = (d + 1) % 30
        far.append(bin(sh[d] ^ sh[other]).count("1"))
    assert sum(close) / len(close) < sum(far) / len(far)
    assert max(close) <= 6  # light perturbation flips few bits


def test_simhash_wide_matches_twin_and_finds_planted_neardups(spark, docs):
    """64-bit SimHash DataFrame ops == their SQL twins, and planted
    near-duplicates land at small Hamming distance sharing >= 1 band."""
    from pageindex_spark.driverq import paired_sql
    from pageindex_spark.operators.dedup import (
        simhash_band_candidates,
        simhash_hamming_pairs,
        simhash_wide,
    )

    base = docs.filter(F.col("doc_id") < 20).select("doc_id", "text")
    pert = base.select(
        (F.col("doc_id") + 100).alias("doc_id"),
        F.concat("text", F.lit(" extra")).alias("text"),
    )
    corpus = base.unionByName(pert)
    corpus.createOrReplaceTempView("documents")
    sqls = paired_sql()
    assert _rows(simhash_wide(corpus)) == _rows(spark.sql(sqls["simhash_wide"][0]))
    assert _rows(simhash_band_candidates(corpus)) == _rows(
        spark.sql(sqls["simhash_band_candidates"][0])
    )
    ham_pairs = _rows(simhash_hamming_pairs(corpus))
    assert ham_pairs == _rows(spark.sql(sqls["simhash_hamming"][0]))
    ham = {(a, b): h for a, b, h in ham_pairs}
    sig = {r["doc_id"]: (r["sim_hi"], r["sim_lo"]) for r in simhash_wide(corpus).collect()}

    def hamming(x, y):
        return bin(sig[x][0] ^ sig[y][0]).count("1") + bin(sig[x][1] ^ sig[y][1]).count("1")

    planted = [hamming(d, d + 100) for d in range(20)]
    unrelated = [hamming(d, (d + 1) % 20) for d in range(20)]
    # light perturbation flips few of 64 bits; unrelated docs ~32
    assert max(planted) <= 16 and sum(planted) / 20 < sum(unrelated) / 20 / 2
    # pigeonhole guarantee: hamming < 4 MUST share a band -> pair surfaced
    for d in range(20):
        if hamming(d, d + 100) < 4:
            assert (d, d + 100) in ham, d
    # every surfaced pair's reported distance is the true 64-bit distance
    for (a, b), h in ham.items():
        assert h == hamming(a, b)
    spark.catalog.dropTempView("documents")


def test_minhash_lsh_catches_planted_duplicates(spark, docs):
    """Plant near-duplicates; every (d, d+10000) pair must share a band
    bucket (exact copies have identical signatures in every band)."""
    from pageindex_spark.operators.dedup import lsh_bands, minhash_signatures

    base = docs.filter(F.col("doc_id") < 50).select("doc_id", "text")
    dups = base.select((F.col("doc_id") + 10000).alias("doc_id"), F.col("text"))
    bands = lsh_bands(minhash_signatures(base.unionByName(dups)))
    buckets: dict[tuple, set] = {}
    for r in bands.collect():
        buckets.setdefault((r["band_id"], r["band_hash"]), set()).add(r["doc_id"])
    for d in range(50):
        assert any(
            d in members and d + 10000 in members for members in buckets.values()
        ), d


def test_lsh_verified_pairs_production_wiring(spark, docs):
    """VERDICT r2 #5a: pairwise Jaccard drawn from LSH candidate buckets
    (not a doc_id bound). Planted exact dups must surface at jaccard6 =
    1e6, and the DataFrame API must hash-match its SQL twin."""
    from pageindex_spark.driverq import paired_sql
    from pageindex_spark.operators.dedup import lsh_verified_pairs

    base = docs.filter(F.col("doc_id") < 30).select("doc_id", "text")
    dups = base.select((F.col("doc_id") + 10000).alias("doc_id"), F.col("text"))
    corpus = base.unionByName(dups)
    corpus.createOrReplaceTempView("documents")
    got = _rows(lsh_verified_pairs(corpus))
    assert got == _rows(spark.sql(paired_sql()["lsh_jaccard"][0]))
    pairs = {(a, b): j for a, b, j in got}
    for d in range(30):
        assert pairs.get((d, d + 10000)) == 1_000_000, d
    spark.catalog.dropTempView("documents")


def test_prod_preset_recall_at_08_jaccard(spark):
    """VERDICT r3 next #5: the production preset (128 hashes / 16 bands of
    8 rows) must catch planted ~0.8-Jaccard near-dups — the regime the
    4-hash oracle config cannot discriminate (its 2-row bands collide on
    almost anything OR miss real mutants, depending on the draw). Mutants:
    3 token edits in a 100-token doc -> distinct-shingle Jaccard ~0.83;
    band-collision theory 1-(1-s^8)^16 predicts ~0.98 recall there. All
    hashing is md5 (deterministic), so recall here is a fixed number, not
    a flaky sample."""
    import random

    from pageindex_spark.operators.dedup import (
        PROD_BANDS,
        PROD_MINHASH,
        lsh_verified_pairs,
    )

    rng = random.Random(99)
    letters = "abcdefghijklmnopqrstuvwxyz"
    word = lambda: "".join(rng.choice(letters) for _ in range(5))
    rows = []
    n_pairs = 40
    for i in range(n_pairs):
        toks = [word() for _ in range(100)]
        rows.append((i, " ".join(toks)))
        mut = list(toks)
        for pos in (15, 50, 85):  # spaced > 2 apart: 3 shingles killed each
            mut[pos] = word()
        rows.append((i + 10_000, " ".join(mut)))
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    got = lsh_verified_pairs(
        corpus, n_hashes=PROD_MINHASH, n_bands=PROD_BANDS
    ).collect()
    pairs = {(r["a"], r["b"]): r["jaccard6"] for r in got}
    hits = [i for i in range(n_pairs) if (i, i + 10_000) in pairs]
    recall = len(hits) / n_pairs
    assert recall >= 0.9, f"prod-preset recall {recall} below 0.9"
    for i in hits:  # verification reports the TRUE Jaccard, not an estimate
        assert 700_000 < pairs[(i, i + 10_000)] < 950_000


def test_degenerate_buckets_capped(spark):
    """VERDICT r2 #5b: 1,000 identical short docs must NOT go quadratic —
    every band bucket exceeds MAX_VERIFY_BUCKET, the verifiers skip them
    (zero pairs, bounded work), and the skipped buckets are auditable."""
    from pageindex_spark.operators.dedup import (
        lsh_bands,
        lsh_verified_pairs,
        minhash_signatures,
        oversized_buckets,
        simhash_hamming_pairs,
    )

    rows = [(i, "alpha beta gamma delta epsilon") for i in range(1000)]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    assert lsh_verified_pairs(corpus).count() == 0
    assert simhash_hamming_pairs(corpus).count() == 0
    skipped = oversized_buckets(
        lsh_bands(minhash_signatures(corpus)), ["band_id", "band_hash"]
    ).collect()
    assert len(skipped) == 2 and all(r["n_docs"] == 1000 for r in skipped)
    # the cap is the only gate: a small identical set under the cap pairs up
    small = corpus.filter(F.col("doc_id") < 10)
    assert lsh_verified_pairs(small, max_bucket=64).count() == 45  # C(10,2)


def test_lsh_ann_recall_vs_exact(spark, vecs):
    from pageindex_spark.operators.similarity import cosine_topk, lsh_ann_topk

    dim = len(vecs.select("embedding").head()["embedding"])
    exact = cosine_topk(vecs, n_query_vecs=5, k=10)
    approx = lsh_ann_topk(vecs, dim, n_query_vecs=5, k=10)
    ex = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    ap = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    # approximate results are a subset of the corpus ranked identically
    # within buckets; recall against exact top-10 must be non-trivial
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.2, recall
    # and every approx hit must rank consistently (cos6 from same formula)
    assert all(qid in range(5) for qid, _ in ap)


def test_ann_batch_external_queries(spark, vecs):
    """Batched ANN surface (VERDICT r4 next #7): queries come in as a
    DataFrame and may be EXTERNAL vectors (not rows of the corpus). A
    slightly-perturbed copy of a corpus vector must retrieve its source as
    top-1 on the exact path, and the LSH path must bucket external queries
    with the same seeded planes (source retrieved in the candidate set)."""
    from pyspark.sql import functions as F

    from pageindex_spark.operators.similarity import (
        cosine_topk_batch,
        lsh_ann_topk_batch,
    )

    dim = len(vecs.select("embedding").head()["embedding"])
    # external queries: vectors 3 and 7 scaled by 1.01 (same direction ->
    # cosine 1.0 to the source), ids offset far beyond the corpus
    queries = (
        vecs.filter(F.col("vec_id").isin([3, 7]))
        .select(
            (F.col("vec_id") + 1_000_000).alias("query_id"),
            F.transform("embedding", lambda x: x * 1.01).alias("embedding"),
        )
    )
    exact = cosine_topk_batch(vecs, queries, k=3).collect()
    top1 = {r["query_id"]: r["vec_id"] for r in exact if r["rank"] == 1}
    assert top1 == {1_000_003: 3, 1_000_007: 7}
    approx = lsh_ann_topk_batch(vecs, queries, dim, k=3).collect()
    got = {(r["query_id"], r["vec_id"]) for r in approx}
    assert (1_000_003, 3) in got and (1_000_007, 7) in got


def test_ivf_ann_recall_and_twin_identity(spark, vecs):
    """IVF scale path (round 5): the DataFrame operator must hash-match its
    SQL twin exactly (same floored cos6, same centroid/probe tie-breaks),
    and probing n_probe of the cells must retain non-trivial recall vs the
    exact scan."""
    from pageindex_spark.driverq import paired_sql
    from pageindex_spark.operators.similarity import cosine_topk, ivf_ann_topk

    vecs.createOrReplaceTempView("embeddings")
    got = _rows(ivf_ann_topk(vecs, n_query_vecs=5, k=10))
    assert got == _rows(spark.sql(paired_sql()["ivf_ann_topk"][0]))
    ex = {(r[0], r[2]) for r in _rows(cosine_topk(vecs, n_query_vecs=5, k=10))}
    ap = {(r[0], r[2]) for r in got}
    assert len(ex & ap) / len(ex) >= 0.2, len(ex & ap) / len(ex)
    spark.catalog.dropTempView("embeddings")


def test_ivf_assignment_covers_corpus_once(spark, vecs):
    """Every vector lands in exactly one cell, and every cell id is a
    centroid id — the invariant that makes the probe join's candidate sets
    disjoint (no distinct needed downstream)."""
    from pageindex_spark.operators.similarity import ivf_assign, ivf_centroids

    cents = ivf_centroids(vecs)
    assigned = ivf_assign(vecs, cents)
    assert assigned.count() == vecs.count()
    cells = {r["cell"] for r in assigned.select("cell").distinct().collect()}
    assert cells <= {cid for cid, _ in cents}


def test_embedding_neardup_planted_and_twin_identity(spark, vecs):
    """Embedding-cosine near-dup (round 5): a planted near-identical vector
    must pair with its source at cos6 ~ 1e6, and the DataFrame operator
    must hash-match the SQL twin on the raw corpus."""
    from pageindex_spark.driverq import paired_sql
    from pageindex_spark.operators.similarity import cosine_neardup_pairs

    dim = len(vecs.select("embedding").head()["embedding"])
    vecs.createOrReplaceTempView("embeddings")
    got = _rows(cosine_neardup_pairs(vecs, dim))
    assert got == _rows(spark.sql(paired_sql()["embedding_neardup"][0]))
    spark.catalog.dropTempView("embeddings")
    # planted: vector 11 scaled by 1.001 (same direction -> cosine ~ 1.0;
    # scaling preserves the sign-bit LSH code, so the pair always collides)
    planted = vecs.filter(F.col("vec_id") == 11).select(
        (F.col("vec_id") + 500_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.001).alias("embedding"),
    )
    both = vecs.select("vec_id", "embedding").unionByName(planted)
    pairs = {
        (r["vid_a"], r["vid_b"]): r["cos6"]
        for r in cosine_neardup_pairs(both, dim).collect()
    }
    assert pairs.get((11, 500_011), 0) >= 999_999


def test_token_estimates_twin_and_values(spark, docs):
    """BPE-ish token estimator (round 5): DataFrame API == SQL twin, and
    the piece rule is pinned on a hand case (<=4-char alnum chunks + each
    symbol its own piece; 'hello world!!' -> hell|o|worl|d|!|! = 6)."""
    from pageindex_spark.driverq import paired_sql
    from pageindex_spark.operators.textstats import token_estimates

    docs.createOrReplaceTempView("documents")
    got = _rows(token_estimates(docs))
    assert got == _rows(spark.sql(paired_sql()["token_count"][0]))
    spark.catalog.dropTempView("documents")
    hand = spark.createDataFrame(
        [(1, "hello world!!"), (2, "  a  b "), (3, "")],
        "doc_id long, text string",
    )
    vals = {r["doc_id"]: (r["ws_tokens"], r["bpe_tokens"]) for r in
            token_estimates(hand).collect()}
    assert vals == {1: (2, 6), 2: (2, 2), 3: (0, 0)}


def test_multimodal_plumbing(spark):
    from pageindex_spark.operators.multimodal import (
        frame_sample,
        image_features,
        probe_metadata,
        synth_media,
    )

    media = synth_media(spark, 24)
    meta = probe_metadata(media)
    assert meta.count() == 24 and "payload" not in meta.columns
    feats = image_features(media).collect()
    assert len(feats) == 24 and all(len(r["feat"]) == 4 for r in feats)
    # deterministic across runs
    feats2 = image_features(media).collect()
    assert sorted(map(str, feats)) == sorted(map(str, feats2))
    frames = frame_sample(media, every_ms=1000)
    counts = {r["media_id"]: r["n"] for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    # duration 2000+500*(i%4) ms -> 2..3 frames
    assert all(2 <= v <= 3 for v in counts.values())


def test_percolate_matches_python(spark, docs):
    """percolate (batch plan) vs brute force over the real testdata docs:
    conjunctive default, min_should_match relaxation, '-term' negation,
    and the stateless plan returning identical rows. Pure-negation and
    msm<1 guards raise."""
    import pyarrow.parquet as pq

    from pageindex_spark.functions.tokenizer import parse_query, tokenize
    from pageindex_spark.plans.percolate import percolate

    tbl = pq.read_table(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text"]
    )
    rows = list(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    queries = [
        (1, "data spark"),
        (2, "data -spark"),
        (3, "stream batch fast slow"),
        (4, "zzqabsent data"),
    ]

    def brute(msm):
        want = set()
        for qid, text in queries:
            pos, negs = parse_query(text)
            terms = sorted(set(tokenize(pos)))
            nterms = {t for n in negs for t in tokenize(n)}
            req = len(terms) if msm is None else min(msm, len(terms))
            for did, t in rows:
                tk = set(tokenize(t))
                nm = sum(1 for x in terms if x in tk)
                if nm >= req and not (nterms & tk):
                    want.add((str(did).zfill(10), qid, nm, req))
        return want

    sdocs = docs.select(
        F.lpad(F.col("doc_id").cast("string"), 10, "0").alias("url"), "text"
    )
    for msm in (None, 2):
        out = percolate(spark, queries, sdocs, min_should_match=msm)
        got = {
            (r["url"], r["query_id"], r["n_matched"], r["n_required"])
            for r in out.collect()
        }
        want = brute(msm)
        assert got == want, f"msm={msm}"
        sl = percolate(
            spark, queries, sdocs, min_should_match=msm, stateless=True
        )
        got_sl = {
            (r["url"], r["query_id"], r["n_matched"], r["n_required"])
            for r in sl.collect()
        }
        assert got_sl == want, f"stateless msm={msm}"
    # semantics anchors: conjunctive 'data -spark' must be disjoint from
    # docs matching 'data spark' conjunctively; an absent term kills a
    # conjunctive query entirely.
    want = brute(None)
    both_q = {u for u, q, _n, _r in want if q == 1}
    negd = {u for u, q, _n, _r in want if q == 2}
    assert negd and both_q and not (negd & both_q)
    assert not {u for u, q, _n, _r in want if q == 4}
    with pytest.raises(ValueError):
        percolate(spark, [(1, "-data -spark")], sdocs)
    with pytest.raises(ValueError):
        percolate(spark, queries, sdocs, min_should_match=0)
