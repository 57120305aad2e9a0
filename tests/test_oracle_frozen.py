"""Round-6 freeze guard: the optimization round's driver contract compares
every ``oracle_sql()`` text against its round-start fingerprint — a changed
oracle is graded as a regression regardless of speed. This test pins all
267 oracle texts to the hashes captured at the round-6 start, so any
Spark-side-only optimization that accidentally leaks into the DuckDB
dialect fails HERE, before it fails the driver.

(If a future BUILD round legitimately adds or changes oracles, regenerate
tests/data_oracle_fp_r06.json — the freeze is a property of optimization
rounds, not of the texts themselves.)
"""

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_FP_PATH = os.path.join(os.path.dirname(__file__), "data_oracle_fp_r06.json")


def test_oracle_sql_texts_match_round_start_fingerprints():
    import __spark_entry__ as entry

    want = json.load(open(_FP_PATH))
    got = {
        name: hashlib.sha256(sql.encode()).hexdigest()[:16]
        for name, sql in entry.oracle_sql().items()
    }
    assert set(got) == set(want), (
        sorted(set(got) - set(want)),
        sorted(set(want) - set(got)),
    )
    diffs = sorted(k for k in want if got[k] != want[k])
    assert not diffs, f"oracle SQL text changed for: {diffs}"
