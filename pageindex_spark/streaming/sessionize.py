"""Custom STATEFUL streaming operator: gap-based sessionization via
``applyInPandasWithState`` (event-time timeout).

The batch engine already sessionizes with a running-sum window (driver
entry ``sessionize``); a stream cannot — a session is open-ended until the
gap elapses, which is exactly the per-key mutable state + timeout shape
Structured Streaming's ``applyInPandasWithState`` exists for. Design:

* state per user: the one OPEN session ``(start_us, end_us, n, sum_value)``;
* each micro-batch folds that user's events (sorted by event time) into the
  state — an event within ``gap`` of the open end extends it, otherwise the
  open session is emitted CLOSED and a new one starts;
* the event-time timeout is armed at ``end + gap``: when the watermark
  passes it, the open session can no longer be extended by any admissible
  event, so it is emitted and the state cleared. Emission is therefore
  exactly-once per session and append-mode safe;
* correctness contract: exact for per-user event-time-ordered arrival
  (late events inside the watermark merge only if they extend the CURRENT
  open session; a late event older than the open session's start would
  have belonged to an already-emitted session and is counted into the open
  one instead — the standard watermark trade-off, bounded by the watermark
  delay).

Scale: state is O(1) per active user (four longs — no event buffering),
partitioned by the groupBy key across executors; each micro-batch touches
only users present in the batch plus timed-out keys. This is the shape
that holds at 10^9 users; the alternative (buffer events, re-sort whole
sessions) is O(session length) state and does not.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
_STATE_SCHEMA = "start_us long, end_us long, n long, sum_value double"


def _emit_row(user_id: int, start_us: int, end_us: int, n: int, sv: float):
    return pd.DataFrame(
        {
            "user_id": pd.array([user_id], dtype="int64"),
            "session_start": pd.to_datetime([start_us], unit="us"),
            "session_end": pd.to_datetime([end_us], unit="us"),
            "n_events": pd.array([n], dtype="int64"),
            "sum_value": pd.array([sv], dtype="float64"),
        }
    )


def _sessionize_fn(gap_s: int):
    gap_us = gap_s * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = int(key[0])
        if state.hasTimedOut:
            # Watermark passed end+gap: no admissible event can extend the
            # open session any more — close it.
            start_us, end_us, n, sv = state.get
            state.remove()
            yield _emit_row(user_id, start_us, end_us, n, sv)
            return
        cur = list(state.get) if state.exists else None
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values("ts")
            ts_us = pdf["ts"].astype("int64") // 1000  # ns -> us
            vals = pdf["value"].astype("float64")
            for t, v in zip(ts_us.tolist(), vals.tolist()):
                if cur is None:
                    cur = [t, t, 1, v]
                elif t - cur[1] <= gap_us:
                    cur[1] = max(cur[1], t)
                    cur[2] += 1
                    cur[3] += v
                else:
                    yield _emit_row(user_id, cur[0], cur[1], cur[2], cur[3])
                    cur = [t, t, 1, v]
        if cur is not None:
            state.update(tuple(cur))
            # arm the close: watermark > end + gap -> timeout fires
            state.setTimeoutTimestamp((cur[1] + gap_us) // 1000 + 1)

    return fn


def stream_sessionize(
    events: DataFrame,
    gap_s: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """(streaming events: user_id, ts, value) -> stream of CLOSED sessions
    ``(user_id, session_start, session_end, n_events, sum_value)``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_s),
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
