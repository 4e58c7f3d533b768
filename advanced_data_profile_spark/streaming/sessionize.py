"""Custom STATEFUL streaming operator: gap-based sessionization via
``applyInPandasWithState`` — the arbitrary-state API the task brief
names for operators Spark's built-in windowed aggs can't express.

Semantics match the batch sessionization query
(__spark_entry__.q_sessionization): events for a user belong to one
session while consecutive gaps are <= gap_sec; a longer gap closes the
session. The OPEN session per user is the state (bounded: one row per
active user — never grows with event volume); a CLOSED session is
emitted exactly once, in the micro-batch whose events closed it.

Ordering model: events are sorted within each micro-batch; across
batches arrival order is assumed session-consistent (a production
deployment adds an event-time watermark and closes idle sessions via
GroupStateTimeout.EventTimeTimeout — the hook is wired below).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

SESSION_SCHEMA = (
    "user_id bigint, session_start double, session_end double, "
    "n_events bigint, session_value double"
)
STATE_SCHEMA = "start double, last double, n bigint, val double"


def _sessionize_fn(gap_sec: float):
    def fn(key, pdfs, state):
        user_id = int(key[0])
        events: list[tuple[float, float]] = []
        for pdf in pdfs:
            events.extend(
                zip(pdf["ts_sec"].astype(float), pdf["value"].astype(float))
            )
        closed: list[tuple] = []

        if state.hasTimedOut:
            # production path: idle timeout closes the open session
            if state.exists:
                start, last, n, val = state.get
                closed.append((user_id, start, last, int(n), val))
                state.remove()
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end",
                         "n_events", "session_value"],
            )
            return

        events.sort()
        if state.exists:
            start, last, n, val = state.get
        else:
            start = last = None
            n, val = 0, 0.0
        for ts, v in events:
            if last is not None and ts - last > gap_sec:
                closed.append((user_id, start, last, int(n), val))
                start, n, val = ts, 0, 0.0
            if start is None:
                start = ts
            last = ts
            n += 1
            val += v
        if start is not None:
            state.update((float(start), float(last), int(n), float(val)))
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start", "session_end",
                     "n_events", "session_value"],
        )

    return fn


def streaming_sessionize(
    events: DataFrame, gap_sec: float = 1800.0
) -> DataFrame:
    """events: a STREAMING DataFrame with (user_id bigint, ts_sec
    double, value double). Returns the stream of CLOSED sessions.

    State is one small tuple per active user; the shuffle is the
    standard groupBy(user_id) hash partitioning, so a hot user is one
    state row, not a memory blow-up."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_sec),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
