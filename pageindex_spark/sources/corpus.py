"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1-2).

Replaces the reference's fixture PDFs (``/root/reference/docs/*.pdf``) and
golden trees (``/root/reference/results-original/*.json``) with a seeded
generator: ``documents (url, warc_ts, html, text, lang)`` exactly as fixed by
BASELINE.json ``input_hint``, plus the 50-query reference query set.

Design points (FIXTURES.md):
* 50,000-term vocabulary, Zipf(s=1.07) draws — the head (~30 terms) yields
  genuine heavy-hitter posting lists that exercise salted splitting;
* 200 planted rare terms appearing in exactly 1-5 documents each — exercise
  partition pruning and tie-breaking;
* doc length ~ lognormal(mean≈400 tokens) clipped [20, 5000];
* 500 sites with Zipfian popularity; ``url = https://site{site:04d}.example/{page:06d}``;
* ``html`` is a boilerplate-wrapped rendering of ``text`` such that
  ``extraction.extract_text(html) == text`` byte-identically (the per-row
  invariant asserted by pytest);
* everything keyed off numpy ``default_rng(seed)`` — no wall clock, no network.

Built with numpy + pyarrow only, so the pure-Python oracle and pytest can
materialize fixtures without a SparkSession.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.extraction import extract_text

SEED = 42
VOCAB_SIZE = 50_000
ZIPF_S = 1.07
N_SITES = 500
N_RARE_TERMS = 200
HEAVY_HEAD = 30  # informational: Zipf head that behaves as stopwords
PARA_TOKENS = 60  # tokens per <p> paragraph
EPOCH_2025 = 1735689600  # 2025-01-01T00:00:00Z in seconds

# Fixed scale points (FIXTURES.md §1; sf-micro added for fast CI e2e,
# sf-mid sized so one build fits the sandbox's burst-CPU budget).
SCALES = {
    "sf-micro": 300,
    "sf-unit": 1_000,
    "sf-2k": 2_000,  # burst-window-sized scaling unit (VERDICT r4 next #1b)
    "sf-small": 10_000,
    "sf-mid": 50_000,
    "sf-bench": 200_000,
    # Multi-file variants for the N->4N scaling cells: a single 145 MB
    # parquet FILE caps Spark's scan at len/maxPartitionBytes splits (and
    # row groups bound it further), so the extract stage's MAP side ran
    # 2-6-way at every core count — the wall-clock flatline the r5s3
    # breakdown exposed. Real Common-Crawl inputs are thousands of files;
    # these variants write documents.parquet as a DIRECTORY of N parts so
    # the scan parallelism actually follows the cell's cores.
    "sf-mid16": 50_000,
    "sf-bench32": 200_000,
    "sf-huge64": 800_000,
    "sf-giant96": 1_600_000,
}

# documents.parquet file count per scale (1 = single file, the default).
SCALE_FILES = {"sf-mid16": 16, "sf-bench32": 32, "sf-huge64": 64, "sf-giant96": 96}

_SYLLABLES = [
    "ba", "ce", "di", "fo", "gu", "ha", "je", "ki", "lo", "mu",
    "na", "pe", "qi", "ro", "su", "ta", "ve", "wi", "xo", "zu",
]


def _word(i: int) -> str:
    """Unique word for vocab index i (bijective base-20 over 2-char syllables)."""
    parts = []
    i += 1  # avoid empty representation for 0
    while i > 0:
        i, d = divmod(i - 1, len(_SYLLABLES))
        parts.append(_SYLLABLES[d])
    return "".join(reversed(parts))


def build_vocab() -> list[str]:
    vocab = [_word(i) for i in range(VOCAB_SIZE)]
    assert len(set(vocab)) == VOCAB_SIZE
    return vocab


def rare_terms() -> list[str]:
    return [f"rareterm{i:04d}" for i in range(N_RARE_TERMS)]


def _zipf_probs(n: int, s: float) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks ** (-s)
    return p / p.sum()


@dataclass
class Corpus:
    url: list[str]
    warc_ts: np.ndarray  # int64 seconds since epoch
    html: list[bytes]
    text: list[str]
    lang: list[str]

    def to_arrow(self) -> pa.Table:
        return pa.table(
            {
                "url": pa.array(self.url, pa.string()),
                "warc_ts": pa.array(self.warc_ts, pa.timestamp("us")).cast(
                    pa.timestamp("us")
                ),
                "html": pa.array(self.html, pa.binary()),
                "text": pa.array(self.text, pa.string()),
                "lang": pa.array(self.lang, pa.string()),
            }
        )


def _lang_of(url: str) -> str:
    # Deterministic 90% en / 10% de+fr+es split keyed on the url bytes.
    h = np.uint64(14695981039346656037)
    for b in url.encode():
        h = np.uint64((int(h) ^ b) * 1099511628211 & 0xFFFFFFFFFFFFFFFF)
    m = int(h) % 30
    if m < 27:
        return "en"
    return ("de", "fr", "es")[m - 27]


def make_documents(n_docs: int, seed: int = SEED) -> Corpus:
    rng = np.random.default_rng(seed)
    vocab = np.array(build_vocab())
    probs = _zipf_probs(VOCAB_SIZE, ZIPF_S)

    # Doc lengths: lognormal around 400 tokens, clipped.
    lens = rng.lognormal(mean=np.log(400.0), sigma=0.7, size=n_docs)
    lens = np.clip(lens, 20, 5000).astype(np.int64)

    # Sites: Zipfian popularity over 500 sites.
    site_probs = _zipf_probs(N_SITES, 1.2)
    sites = rng.choice(N_SITES, size=n_docs, p=site_probs)

    # One big vectorized token draw, then split per doc.
    total = int(lens.sum())
    draws = rng.choice(VOCAB_SIZE, size=total, p=probs)
    offsets = np.concatenate(([0], np.cumsum(lens)))

    # Plant rare terms: term j appears in 1-5 deterministic docs.
    rare = rare_terms()
    rare_placement: dict[int, list[str]] = {}
    for j, rt in enumerate(rare):
        k = 1 + (j % 5)
        for c in range(k):
            doc = (j * 2654435761 + c * 40503) % n_docs
            rare_placement.setdefault(doc, []).append(rt)

    urls, htmls, texts, langs = [], [], [], []
    ts = EPOCH_2025 + np.arange(n_docs, dtype=np.int64)
    for d in range(n_docs):
        toks = list(vocab[draws[offsets[d] : offsets[d + 1]]])
        extra = rare_placement.get(d)
        if extra:
            # Deterministic insertion points spread through the doc.
            for i, rt in enumerate(extra):
                pos = (i * 7919) % (len(toks) + 1)
                toks.insert(pos, rt)
        paras = [
            " ".join(toks[i : i + PARA_TOKENS]) for i in range(0, len(toks), PARA_TOKENS)
        ]
        text = "\n".join(paras)
        url = f"https://site{sites[d]:04d}.example/{d:06d}"
        title = " ".join(toks[:5])
        body = "".join(f"<p>{p}</p>\n" for p in paras)
        html = (
            "<html><head><title>" + title + "</title>"
            '<script type="text/javascript">var trk=1;function t(){return trk}</script>'
            "<style>.x{color:#000}</style></head>\n"
            "<body><nav><a href=/>home</a> | <a href=/about>about</a></nav>\n"
            "<header><h1 class=logo>site logo</h1></header>\n" + body +
            '<div class="footer">&copy; example corp | terms | privacy</div>\n'
            "<footer>generated page</footer></body></html>"
        ).encode("utf-8")
        urls.append(url)
        htmls.append(html)
        texts.append(text)
        langs.append(_lang_of(url))

    return Corpus(url=urls, warc_ts=ts * 1_000_000, html=htmls, text=texts, lang=langs)


def make_queries(seed: int = SEED) -> list[tuple[int, str]]:
    """50 deterministic queries (FIXTURES.md §2): 20 single-term spanning the
    Zipf head/mid/tail, 20 two-term, 10 three-term including heavy+rare mixes
    (the worst case for WAND pruning)."""
    rng = np.random.default_rng(seed + 1)
    vocab = build_vocab()
    rare = rare_terms()
    qs: list[tuple[int, str]] = []
    qid = 1
    # Single-term: head ranks, mid ranks, tail ranks.
    picks = (
        list(range(0, 10))
        + [int(x) for x in rng.integers(100, 2000, size=5)]
        + [int(x) for x in rng.integers(10_000, VOCAB_SIZE, size=5)]
    )
    for p in picks:
        qs.append((qid, vocab[p]))
        qid += 1
    # Two-term.
    for i in range(20):
        a = int(rng.integers(0, 200))
        b = int(rng.integers(200, 20_000))
        qs.append((qid, f"{vocab[a]} {vocab[b]}"))
        qid += 1
    # Three-term incl. heavy + rare.
    for i in range(10):
        heavy = vocab[int(rng.integers(0, HEAVY_HEAD))]
        mid = vocab[int(rng.integers(500, 5000))]
        r = rare[int(rng.integers(0, N_RARE_TERMS))]
        qs.append((qid, f"{heavy} {mid} {r}"))
        qid += 1
    assert len(qs) == 50
    return qs


def write_corpus(
    out_dir: str, n_docs: int, seed: int = SEED, n_files: int = 1
) -> str:
    """Materialize documents.parquet + queries.parquet under out_dir;
    idempotent. ``n_files > 1`` writes documents.parquet as a DIRECTORY of
    that many part files (same rows, same order — part boundaries are
    contiguous url-order slices), the shape real web-scale inputs have;
    Spark and pyarrow read either layout identically."""
    os.makedirs(out_dir, exist_ok=True)
    doc_path = os.path.join(out_dir, "documents.parquet")
    q_path = os.path.join(out_dir, "queries.parquet")
    if not os.path.exists(doc_path):
        corpus = make_documents(n_docs, seed)
        # Invariant check at generation time: extractor reproduces text.
        for i in (0, len(corpus.text) // 2, len(corpus.text) - 1):
            assert extract_text(corpus.html[i]) == corpus.text[i]
        tbl = corpus.to_arrow()
        if n_files <= 1:
            pq.write_table(tbl, doc_path, row_group_size=8192)
        else:
            tmp = doc_path + ".tmp"
            os.makedirs(tmp, exist_ok=True)
            per = (tbl.num_rows + n_files - 1) // n_files
            for f in range(n_files):
                part = tbl.slice(f * per, per)
                if part.num_rows == 0:
                    break
                pq.write_table(
                    part,
                    os.path.join(tmp, f"part-{f:05d}.parquet"),
                    row_group_size=8192,
                )
            os.rename(tmp, doc_path)  # directory move = the commit point
    if not os.path.exists(q_path):
        qs = make_queries(seed)
        tbl = pa.table(
            {
                "query_id": pa.array([q[0] for q in qs], pa.int32()),
                "query_text": pa.array([q[1] for q in qs], pa.string()),
            }
        )
        pq.write_table(tbl, q_path)
    return out_dir


def ensure_scale(name: str, base_dir: str = "/root/repo/data") -> str:
    """Materialize one of the fixed scales under base_dir/<name>; returns dir."""
    n = SCALES[name]
    out = os.path.join(base_dir, name)
    return write_corpus(out, n, n_files=SCALE_FILES.get(name, 1))
