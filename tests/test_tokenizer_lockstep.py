"""Four-way tokenizer lockstep on adversarial Unicode (ADVICE r1).

The engines' LOWERCASE implementations disagree on exotic case mappings
(U+0130 'İ' -> 'i'+COMBINING DOT in Python/JVM vs bare 'i' in Arrow
utf8proc), which round 1 left as a latent desync between the index's
tf/doc_len (Arrow) and the norms/avgdl (Spark SQL). The ASCII-strip-first
tokenizer kills the divergence by construction; this test pins all four
implementations on exactly the characters that used to split them, plus a
seeded fuzz batch over the BMP and astral planes.
"""

import random

import duckdb
import pyarrow as pa

from pageindex_spark.functions.sqlglue import DUCK_TERMS, SPARK_TERMS
from pageindex_spark.functions.tokenizer import tokenize
from pageindex_spark.operators.spimi import _tokenize_arrow

ADVERSARIAL = [
    "Turkish İstanbul Iı dotted",          # U+0130 / U+0131
    "İİİ solo", "ıIİi runs",
    "straße STRASSE ẞ sharp",              # ß / U+1E9E
    "ﬁle ﬂow ligatures",                   # U+FB01/U+FB02
    "K kelvin sign", "Å angstrom sign",    # U+212A / U+212B
    "Greek ΣIGMA σ final ς",
    "áccent é combining á é",
    "𝐀𝐁𝐂 math bold", "emoji 🎉 party",
    "ŉapostrophe", "ǅ titlecase Ǆǆ",
    "zero​width", "nbsp space",
    "tab\tand\nnewline", "CRLF\r\n mix",
    "", " ", "x", "123", "a1b2C3",
    "mixed-ASCII_only 42 OK",
]


def _fuzz(n: int = 300) -> list[str]:
    rng = random.Random(42)
    out = []
    for _ in range(n):
        chars = []
        for _ in range(rng.randint(0, 40)):
            r = rng.random()
            if r < 0.5:
                chars.append(chr(rng.randint(32, 126)))  # printable ASCII
            elif r < 0.8:
                chars.append(chr(rng.randint(0xC0, 0x2FF)))  # latin ext
            elif r < 0.95:
                chars.append(chr(rng.randint(0x370, 0x4FF)))  # greek/cyrillic
            else:
                chars.append(chr(rng.randint(0x10000, 0x10200)))  # astral
        out.append("".join(chars))
    return out


def test_four_way_tokenizer_lockstep(spark):
    texts = ADVERSARIAL + _fuzz()
    py = [tokenize(t) for t in texts]

    # Arrow: doc_lens + per-doc token multisets
    codes, doc_idx, doc_lens, terms = _tokenize_arrow(pa.array(texts, pa.string()))
    assert doc_lens.tolist() == [len(p) for p in py]
    arrow_docs: dict[int, dict[str, int]] = {}
    for c, d in zip(codes.tolist(), doc_idx.tolist()):
        arrow_docs.setdefault(d, {})
        arrow_docs[d][terms[c]] = arrow_docs[d].get(terms[c], 0) + 1
    for i, p in enumerate(py):
        want: dict[str, int] = {}
        for t in p:
            want[t] = want.get(t, 0) + 1
        assert arrow_docs.get(i, {}) == want, (i, texts[i])

    # Spark SQL (ordered lists)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got_spark = {
        r["i"]: list(r["toks"])
        for r in df.selectExpr("i", f"{SPARK_TERMS.format(col='text')} as toks").collect()
    }
    assert got_spark == {i: p for i, p in enumerate(py)}

    # DuckDB (ordered lists)
    con = duckdb.connect()
    con.register("t", pa.table({"i": list(range(len(texts))), "text": texts}))
    got_duck = dict(
        con.sql(f"select i, {DUCK_TERMS.format(col='text')} from t").fetchall()
    )
    assert got_duck == {i: p for i, p in enumerate(py)}

    # Spark count form (the extract stage's allocation-free doc_len) and
    # fingerprint normalizer: both re-expressed through the POSITIVE token
    # class in r5 (sqlglue docstring) — pin them to the Python tokenizer and
    # the unchanged DuckDB normalizer on the same adversarial inputs.
    from pageindex_spark.functions.sqlglue import (
        DUCK_FP_NORM,
        SPARK_FP_NORM,
        SPARK_TERM_COUNT,
    )

    got_counts = {
        r["i"]: r["c"]
        for r in df.selectExpr(
            "i", f"{SPARK_TERM_COUNT.format(col='text')} as c"
        ).collect()
    }
    assert got_counts == {i: len(p) for i, p in enumerate(py)}

    got_fp = {
        r["i"]: r["n"]
        for r in df.selectExpr(
            "i", f"{SPARK_FP_NORM.format(col='text')} as n"
        ).collect()
    }
    duck_fp = dict(
        con.sql(f"select i, {DUCK_FP_NORM.format(col='text')} from t").fetchall()
    )
    assert got_fp == duck_fp
    assert got_fp == {i: " ".join(p) for i, p in enumerate(py)}
