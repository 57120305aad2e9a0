"""Driver-gate simulation: run EVERY __spark_entry__ entry against its
DuckDB oracle and compare exactly the way the round driver does — column
names (sorted), row count, and row values with columns reordered by name.

    python jobs/oracle_sweep.py                   # all entries at sf0.001
    SWEEP_SF=/root/testdata/sf0.01 python jobs/oracle_sweep.py
    python jobs/oracle_sweep.py match_hll engine_match_hll   # subset

Prints one line per entry and a final JSON summary line
{"entries": N, "ok": N, "fails": [...], "sf": ..., "sec": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(r[i] for i in order) for r in rows)


def main() -> int:
    import __spark_entry__ as E
    from pageindex_spark.session import get_spark

    sf_dir = os.environ.get("SWEEP_SF", "/root/testdata/sf0.001")
    spark = get_spark(cores=int(os.environ.get("SWEEP_CPUS", "16")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from read_parquet('{p}')")
    qs, oracles = E.queries(), E.oracle_sql()
    names = sys.argv[1:] or sorted(qs)
    fails, t0 = [], time.time()
    for i, name in enumerate(names):
        try:
            sdf = qs[name](spark, sf_dir)
            scols = [c.lower() for c in sdf.columns]
            srows = [tuple(r) for r in sdf.collect()]
            cur = con.execute(oracles[name])
            dcols = [c[0].lower() for c in cur.description]
            drows = cur.fetchall()
            ok = sorted(scols) == sorted(dcols) and _norm(scols, srows) == _norm(
                dcols, drows
            )
            if not ok:
                fails.append(name)
            print(
                f"[{i + 1}/{len(names)}] {name}: "
                f"{'OK' if ok else 'FAIL'} rows={len(srows)}",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            fails.append(name)
            print(f"[{i + 1}/{len(names)}] {name}: ERROR {e!r:.300}", flush=True)
    print(
        json.dumps(
            {
                "entries": len(names),
                "ok": len(names) - len(fails),
                "fails": fails,
                "sf": sf_dir,
                "sec": round(time.time() - t0, 1),
            }
        )
    )
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
