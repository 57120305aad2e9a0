"""Build configuration with unknown-key rejection.

Reference parity: PageIndex merges user options over defaults and fails fast
on options it does not know (``/root/reference/pageindex/utils.py:613-644``,
``config()`` + ``ConfigLoader.load`` raising on unexpected keys). Same
contract here — a typo'd tuning knob must kill the job at submit time, not
silently build a 100 TB index with defaults.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field, fields

from .operators.codec import BLOCK_SIZE
from .operators.compaction import TARGET_RUN_BYTES


@dataclass
class BuildConfig:
    """Every tunable of the index build pipeline (see plans/build_index.py)."""

    num_partitions: int | None = None
    n_buckets: int = 32
    n_seg_chunks: int = 4
    n_bucket_chunks: int = 4
    target_run_bytes: int = field(default=TARGET_RUN_BYTES)
    block_size: int = field(default=BLOCK_SIZE)
    fold_light: bool = True
    iceberg_table: str | None = None
    gc_runs_raw: bool = True

    def as_kwargs(self) -> dict:
        return asdict(self)


def load_config(
    overrides: dict | None = None, path: str | None = None
) -> BuildConfig:
    """defaults <- json file at ``path`` <- ``overrides`` dict; any key not
    declared on BuildConfig raises ValueError naming the offenders."""
    known = {f.name for f in fields(BuildConfig)}
    merged: dict = {}
    for source, opts in (("config file", _read_json(path)), ("overrides", overrides or {})):
        unknown = sorted(set(opts) - known)
        if unknown:
            raise ValueError(
                f"unknown config key(s) in {source}: {', '.join(unknown)} "
                f"(known: {', '.join(sorted(known))})"
            )
        merged.update({k: v for k, v in opts.items() if v is not None})
    return BuildConfig(**merged)


def _read_json(path: str | None) -> dict:
    if not path:
        return {}
    with open(path) as f:
        loaded = json.load(f)
    if not isinstance(loaded, dict):
        raise ValueError(f"config file {path} must hold a JSON object")
    return loaded
