"""Sketch surfaces: HLL cardinality (lockstep + accuracy) and the Bloom
filter's no-false-negative guarantee.

The cross-engine hash identity of the driver entries themselves is covered
by test_driver_contract (match_hll / vocab_hll / bloom_membership /
engine_match_hll are in the paired and custom-entry sweeps); these tests pin
the parts a hash match can't: the linear-counting branch agrees across ALL
reachable inputs (not just the ones today's data hits), the estimate is
actually accurate, and the Bloom filter admits every inserted key.
"""

import math
import os

import duckdb
import pytest

from pageindex_spark.driverq import TABLES
from pageindex_spark.functions.sketches import (
    HLL_LC_BAR,
    HLL_M,
    hll_estimate,
    hll_sketch,
)
from pageindex_spark.functions.sqlglue import DUCK_TERMS

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from read_parquet('{p}')")
    return con


def test_hll_linear_counting_pinned_across_engines(spark):
    """m * ln(m / zeros) floors identically in Spark, DuckDB and Python for
    EVERY reachable zeros value 1..m — the only data-dependent float math
    in the sketch whose operands aren't a single division. A hash-match on
    today's corpus only exercises a handful of zeros values; this pins all
    256 so no future corpus can land on a divergent one."""
    expr = (
        f"cast(floor(1000000.0 * ({float(HLL_M)!r} * "
        f"ln({float(HLL_M)!r} / cast(z as double)))) as bigint)"
    )
    got_spark = {
        r["z"]: r["lc6"]
        for r in spark.sql(
            f"select z, {expr} as lc6 from "
            f"(select explode(sequence(1, {HLL_M})) as z)"
        ).collect()
    }
    got_duck = dict(
        duckdb.connect()
        .execute(
            f"select z, {expr} as lc6 from "
            f"(select unnest(generate_series(1, {HLL_M})) as z)"
        )
        .fetchall()
    )
    want = {
        z: math.floor(1000000.0 * (HLL_M * math.log(HLL_M / float(z))))
        for z in range(1, HLL_M + 1)
    }
    assert got_spark == want
    assert got_duck == want


def test_hll_python_oracle_matches_duck_twin(duck):
    """The pure-Python sketch (functions/sketches.py) reproduces the DuckDB
    twin's register state and estimate on the real corpus — three
    implementations in lockstep, same discipline as the tokenizer."""
    import __spark_entry__ as E

    rows = duck.execute(E.oracle_sql()["match_hll"]).fetchall()
    assert rows, "match_hll twin returned nothing"
    # Rebuild each query's value set relationally (the LOCKED tokenizer
    # expression, not a re-derivation), then sketch it in Python.
    vals_sql = f"""
with queries(query_id, query_text) as (values (1, 'data spark'), (3, 'customer')),
toks as (select doc_id, {DUCK_TERMS.format(col='text')} as terms from documents),
qtok as (select query_id, unnest(string_split(query_text, ' ')) as term from queries),
occ as (select doc_id, unnest(terms) as term from toks),
matched as (select distinct q.query_id, o.doc_id from qtok q
            join occ o on o.term = q.term)
select m.query_id, cast(d.n_chars as bigint) from matched m
join documents d on d.doc_id = m.doc_id
"""
    by_q: dict[int, list] = {}
    for qid, v in duck.execute(vals_sql).fetchall():
        by_q.setdefault(qid, []).append(v)
    twin = {r[0]: (r[3], r[4], r[5]) for r in rows}  # zeros, s53, est6
    for qid, vals in by_q.items():
        zeros, s53 = hll_sketch(vals)
        est6 = math.floor(1000000.0 * hll_estimate(zeros, s53))
        assert twin[qid] == (zeros, s53, est6), qid


@pytest.mark.parametrize("n", [500, 2000, 8000])
def test_hll_estimate_accuracy(n):
    """The estimate lands within the expected HLL error envelope (~1.04 /
    sqrt(m) ≈ 6.5% standard error at m=256; 4 sigma bound) on synthetic
    cardinalities spanning the linear-counting and raw branches."""
    zeros, s53 = hll_sketch(f"value-{i}" for i in range(n))
    est = hll_estimate(zeros, s53)
    assert abs(est - n) / n < 4 * 1.04 / math.sqrt(HLL_M), (n, est)
    # branch sanity: small n uses linear counting, large n the raw estimate
    raw = est if zeros == 0 else None
    if n >= 2000:
        assert (0.7213 / (1.0 + 1.079 / HLL_M)) * HLL_M * HLL_M * float(
            1 << 53
        ) / s53 > HLL_LC_BAR or zeros == 0, (n, zeros, raw)


def test_bloom_no_false_negatives(duck):
    """Every vocabulary term probes maybe_present=true against the filter
    built from the vocabulary — the Bloom guarantee the join-pruning use
    case depends on. Probes the FULL vocab, not the twin's fixed list."""
    from pageindex_spark.driverq import (
        BLOOM_BITS,
        BLOOM_HEXOFFS,
        _Dialect,
        _bloom_pos,
    )

    d = _Dialect("duck")
    ins = " union all ".join(
        f"select {_bloom_pos(d, 'term', off)} as pos from vocab"
        for off in BLOOM_HEXOFFS
    )
    outs = " union all ".join(
        f"select term as candidate, {_bloom_pos(d, 'term', off)} as pos from vocab"
        for off in BLOOM_HEXOFFS
    )
    sql = f"""
with vocab as (select distinct unnest({DUCK_TERMS.format(col='text')}) as term
    from documents),
setbits as ({ins}),
words as (select pos // 63 as w, bit_or(1::bigint << (pos % 63)) as bits
          from setbits group by pos // 63),
probes as ({outs}),
hits as (select p.candidate,
         case when b.bits is not null and (b.bits & (1::bigint << (p.pos % 63))) != 0
              then 1 else 0 end as hit
         from probes p left join words b on b.w = p.pos // 63)
select count(*) from (select candidate from hits group by candidate
                      having sum(hit) < {len(BLOOM_HEXOFFS)})
"""
    assert BLOOM_BITS == 4032  # the twin's layout: 64 words x 63 bits
    assert duck.execute(sql).fetchone()[0] == 0


def test_hll_lockstep_on_arbitrary_strings():
    """Property: the pure-Python sketch and the DuckDB register fragment
    agree on ARBITRARY string multisets (not just the corpus's numeric
    renderings) — pins that both hash the same utf-8 bytes and fold
    registers identically. Hypothesis drives the value sets; DuckDB
    re-derives (zeros, s53, est6) from a VALUES relation via the same
    fragment driverq composes into the twins."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pageindex_spark.driverq import _Dialect, _hll_finish, _hll_regs

    d = _Dialect("duck")
    con = duckdb.connect()

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.text(
                alphabet=st.characters(min_codepoint=32, max_codepoint=591),
                min_size=0,
                max_size=24,
            ),
            min_size=1,
            max_size=200,
        )
    )
    def check(vals):
        zeros, s53 = hll_sketch(vals)
        est6 = math.floor(1000000.0 * hll_estimate(zeros, s53))
        lits = ", ".join("(?)" for _ in vals)
        sql = f"""
with grp(v) as (values {lits}),
src as (select 1 as g, v from grp),
{_hll_regs(d, "src", "g", "v").lstrip()},
{_hll_finish(d, "g")}
select zeros, s53, est6 from fin
"""
        got = con.execute(sql, vals).fetchone()
        assert got == (zeros, s53, est6), (vals[:3], got, (zeros, s53, est6))

    check()
