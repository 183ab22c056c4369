"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (the Arrow-batched stateful surface).

Batch twin: plans/relational.py::sessionize_events (lag-window form, DuckDB
oracle-checked).  The streaming form keeps ONE open session per user in
state; each micro-batch merges its events into the open session, emits
every session that a ≥gap interval has closed, and parks the still-open
tail in state (with a processing-time timeout to flush idle users).

Scale notes: state is O(active users) × a 4-field tuple; the shuffle key is
user_id (high-cardinality); Arrow batches the per-user groups, so the
python hot path is a per-group pandas sort, not per-row work.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

SESSION_GAP_US = 30 * 60 * 1_000_000

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start_us", T.LongType(), False),
        T.StructField("session_end_us", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("closed_by", T.StringType(), False),  # 'gap' | 'timeout'
    ]
)

# state: (session_start_us, session_end_us, n_events)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _make_sessionizer(idle_timeout_ms: int):
    def _sessionize_group(
            key: Tuple[Any, ...],
            pdfs: Iterator[pd.DataFrame],
            state: GroupState,
        ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int, str]] = []

        if state.hasTimedOut:
            if state.exists:
                s, e, n = state.get
                closed.append((s, e, n, "timeout"))
            state.remove()
        else:
            ts: list[int] = []
            for pdf in pdfs:
                ts.extend(int(v) for v in pdf["ts_us"])
            ts.sort()
            if state.exists:
                cur_start, cur_end, cur_n = state.get
            else:
                cur_start, cur_end, cur_n = None, None, 0
            for t in ts:
                if cur_start is None:
                    cur_start, cur_end, cur_n = t, t, 1
                elif t - cur_end > SESSION_GAP_US:
                    closed.append((cur_start, cur_end, cur_n, "gap"))
                    cur_start, cur_end, cur_n = t, t, 1
                else:
                    # cross-batch out-of-order arrival: an event older than
                    # the stored session end must not shrink the session
                    # (a shrunken end would spuriously split on the next gap
                    # check); extend the envelope instead
                    cur_start = min(cur_start, t)
                    cur_end = max(cur_end, t)
                    cur_n += 1
            if cur_start is not None:
                state.update((cur_start, cur_end, cur_n))
                state.setTimeoutDuration(idle_timeout_ms)  # flush idle users

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start_us": [c[0] for c in closed],
                    "session_end_us": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                    "closed_by": [c[3] for c in closed],
                }
            )


        yield from ()

    return _sessionize_group


def streaming_sessions(
    events_stream: DataFrame, idle_timeout_ms: int = 60_000
) -> DataFrame:
    """events stream (event_id, ts, user_id, ...) → closed-session stream."""
    from pyspark.sql import functions as F

    prepared = events_stream.select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _make_sessionizer(idle_timeout_ms),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
