"""Per-partition checkpoint lineage + metrics (north rule: a killed build
resumes from the last committed partition; never re-extract / re-tokenize).

Reference parity: the reference's JsonLogger append-log
(``/root/reference/pageindex/utils.py:313-349``) and its memoized
continuation of truncated LLM output (``page_index.py:300-328``) are the
closest analogues; here it is a real manifest: one row per committed
(stage, partition) with docs/bytes/terms metrics (FIXTURES.md §4).

Commit protocol on the parquet shim: each chunk's data write completes
FIRST (Spark's file-commit protocol makes it all-or-nothing per write),
then the lineage rows are appended. A kill between the two leaves committed
data without lineage -> the chunk re-runs into an overwrite of the same
subdirectory (idempotent), so the invariant "lineage row => data valid"
always holds. On Iceberg both would be one snapshot commit.

Round-6 optimization (guide §1.2 / §5 "the driver should do almost no data
work" — and the manifest IS no data work): the manifest holds a handful of
metadata rows per build, yet every append used to run a full Spark job
(createDataFrame -> coalesce(1) -> parquet write) and every resume check
another (read -> filter -> collect). At ~1-2 s of fixed job overhead per
launch in this sandbox that was ~7 pure-overhead jobs per build. The rows
are now written/read driver-side with pyarrow: same directory, same schema
(Spark and pyarrow parquet are mutually readable — old Spark-written
manifests keep loading), same append-a-new-file semantics with an atomic
rename per append. The ``spark`` parameters stay for API compatibility.
"""

from __future__ import annotations

import os
import uuid
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq

LINEAGE_SCHEMA = (
    "stage string, partition_id int, status string, docs long, bytes long, "
    "terms long, committed_at timestamp"
)

_PA_SCHEMA = pa.schema(
    [
        pa.field("stage", pa.string()),
        pa.field("partition_id", pa.int32()),
        pa.field("status", pa.string()),
        pa.field("docs", pa.int64()),
        pa.field("bytes", pa.int64()),
        pa.field("terms", pa.int64()),
        pa.field("committed_at", pa.timestamp("us", tz="UTC")),
    ]
)


def lineage_path(index_dir: str) -> str:
    return os.path.join(index_dir, "_lineage")


def _lineage_files(path: str) -> list[str]:
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )


def _read_lineage(path: str, columns: list[str]) -> pa.Table | None:
    """Concat the manifest's part files, reading only ``columns`` — the
    committed_at column is never needed by readers, and skipping it keeps
    Spark-written (INT96 timestamp) and pyarrow-written (int64 micros)
    manifests trivially concat-compatible."""
    if not os.path.exists(path):
        return None
    files = _lineage_files(path)
    if not files:
        return None
    sub = pa.schema([_PA_SCHEMA.field(c) for c in columns])
    return pa.concat_tables(
        pq.read_table(f, columns=columns).cast(sub) for f in files
    )


def append_lineage(
    spark,
    index_dir: str,
    stage: str,
    rows: list[tuple[int, int, int, int]],  # (partition_id, docs, bytes, terms)
    committed_at: datetime | None = None,
) -> None:
    # Real commit timestamp (ADVICE r2): resume only keys off (stage,
    # partition_id, status) so a wall-clock stamp never affects determinism
    # of WHAT resumes — it only makes the manifest auditable.
    ts = committed_at or datetime.now(timezone.utc)
    path = lineage_path(index_dir)
    os.makedirs(path, exist_ok=True)
    table = pa.table(
        {
            "stage": [stage] * len(rows),
            "partition_id": [int(pid) for pid, _d, _b, _t in rows],
            "status": ["committed"] * len(rows),
            "docs": [int(docs) for _p, docs, _b, _t in rows],
            "bytes": [int(nbytes) for _p, _d, nbytes, _t in rows],
            "terms": [int(terms) for _p, _d, _b, terms in rows],
            "committed_at": [ts] * len(rows),
        },
        schema=_PA_SCHEMA,
    )
    fname = f"part-{uuid.uuid4().hex}.parquet"
    tmp = os.path.join(path, f".{fname}.tmp")
    pq.write_table(table, tmp)
    os.replace(tmp, os.path.join(path, fname))  # atomic append-commit


def committed_partitions(spark, index_dir: str, stage: str) -> set[int]:
    t = _read_lineage(
        lineage_path(index_dir), ["stage", "partition_id", "status"]
    )
    if t is None:
        return set()
    import pyarrow.compute as pc

    mask = pc.and_(
        pc.equal(t["stage"], stage), pc.equal(t["status"], "committed")
    )
    return set(t.filter(mask)["partition_id"].to_pylist())


def stage_metrics(spark, index_dir: str) -> dict:
    t = _read_lineage(
        lineage_path(index_dir),
        ["stage", "partition_id", "docs", "bytes", "terms"],
    )
    if t is None:
        return {}
    agg = (
        t.group_by("stage")
        .aggregate(
            [
                ("partition_id", "count"),
                ("docs", "sum"),
                ("bytes", "sum"),
                ("terms", "sum"),
            ]
        )
        .to_pylist()
    )
    return {
        r["stage"]: {
            "partitions": r["partition_id_count"],
            "docs": r["docs_sum"],
            "bytes": r["bytes_sum"],
            "terms": r["terms_sum"],
        }
        for r in agg
    }
