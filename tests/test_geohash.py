"""Geohash cell-id encoding: the generated floor-div/mod arithmetic
(sqlglue.geohash_cell_exprs) must reproduce the classic bisection
algorithm exactly — known landmark values plus a hypothesis sweep of the
full domain, evaluated through DuckDB (the same expression string the
Spark side runs; cross-engine identity of the driver entries is covered
by test_driver_contract's geohash_grid / engine_geohash rows)."""

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from pageindex_spark.functions.sqlglue import (
    GEOHASH_B32,
    geohash_cell_exprs,
    geohash_char_expr,
)


def _reference(lat: float, lon: float, p: int) -> str:
    """The textbook interval-bisection geohash."""
    lat_r, lon_r = [-90.0, 90.0], [-180.0, 180.0]
    bits, even, ch, out = 0, True, 0, []
    while len(out) < p:
        rng = lon_r if even else lat_r
        v = lon if even else lat
        mid = (rng[0] + rng[1]) / 2
        if v >= mid:
            ch, rng[0] = ch * 2 + 1, mid
        else:
            ch, rng[1] = ch * 2, mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(GEOHASH_B32[ch])
            bits, ch = 0, 0
    return "".join(out)


def _sql_geohash(con, pts, p: int):
    lon_i, lat_i, code = geohash_cell_exprs("lon", "lat", p)
    gh = " || ".join(geohash_char_expr(i, p) for i in range(p))
    lits = ", ".join("(?, ?)" for _ in pts)
    flat = [x for pt in pts for x in pt]
    sql = f"""
with pts(lat, lon) as (values {lits}),
gi as (select {lon_i} as lon_i, {lat_i} as lat_i from pts),
gc as (select cast(({code}) as bigint) as code from gi)
select {gh} from gc
"""
    return [r[0] for r in con.execute(sql, flat).fetchall()]


def test_geohash_known_landmarks():
    pts = [(57.64911, 10.40744), (37.77, -122.42), (-25.38, 131.04), (0.0, 0.0)]
    got = _sql_geohash(duckdb.connect(), pts, 5)
    assert got == ["u4pru", "9q8yy", "qgmpt", "s0000"]
    # other precisions slice consistently (prefix property of geohash)
    assert _sql_geohash(duckdb.connect(), pts[:1], 7)[0].startswith("u4pru")
    assert _sql_geohash(duckdb.connect(), pts[:1], 2)[0] == "u4"


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=-9000, max_value=8999),
    st.integers(min_value=-18000, max_value=17999),
    st.integers(min_value=1, max_value=7),
)
def test_geohash_matches_bisection_reference(lat_c, lon_c, p):
    """Swept over the centi-degree grid the GEO_LAT/GEO_LON dims actually
    produce. (NOT arbitrary floats: a coordinate within one ulp of a cell
    boundary — e.g. lon = -1e-45 — legitimately rounds to either side
    under the multiply encoding vs the bisection; on the 0.01 grid every
    non-boundary point is >= ~3e-7 from any boundary up to p=7, far above
    float error, and exact-boundary points agree by the >= convention.
    Cross-ENGINE identity holds for any input — both run the same
    expression — which is what the driver entries check.)"""
    lat, lon = lat_c / 100.0, lon_c / 100.0
    con = duckdb.connect()
    assert _sql_geohash(con, [(lat, lon)], p) == [_reference(lat, lon, p)]
