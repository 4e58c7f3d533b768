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


def _sessionize_fn(gap_sec: float, idle_timeout_sec: float | None = None):
    def fn(key, pdfs, state):
        user_id = int(key[0])
        events: list[tuple[float, float]] = []
        for pdf in pdfs:
            events.extend(
                zip(pdf["ts_sec"].astype(float), pdf["value"].astype(float))
            )
        closed: list[tuple] = []

        if state.hasTimedOut:
            # idle timeout fired: close and emit the open session (a
            # user who stopped sending events would otherwise hold an
            # open session forever and never be emitted)
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
            # LATE-EVENT CLAMP: a cross-batch event older than the
            # stored `last` merges into the open session (counts, adds
            # value, may extend session_start backwards) but must never
            # move the session END backwards — otherwise the next
            # in-order event sees an artificially large gap and splits
            # the session spuriously.
            start = min(start, ts)
            last = ts if last is None else max(last, ts)
            n += 1
            val += v
        if start is not None:
            state.update((float(start), float(last), int(n), float(val)))
            if idle_timeout_sec is not None:
                # event-time timeout: fires once the watermark passes
                # last-seen + idle gap (timestamps are epoch millis)
                state.setTimeoutTimestamp(int((last + idle_timeout_sec) * 1000))
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start", "session_end",
                     "n_events", "session_value"],
        )

    return fn


def streaming_sessionize(
    events: DataFrame,
    gap_sec: float = 1800.0,
    idle_timeout_sec: float | None = None,
) -> DataFrame:
    """events: a STREAMING DataFrame with (user_id bigint, ts_sec
    double, value double). Returns the stream of CLOSED sessions.

    State is one small tuple per active user; the shuffle is the
    standard groupBy(user_id) hash partitioning, so a hot user is one
    state row, not a memory blow-up.

    idle_timeout_sec: when set, uses GroupStateTimeout.EventTimeTimeout
    and registers last_event + idle_timeout_sec as the timeout, so an
    idle user's OPEN session is closed and emitted once the watermark
    passes it (the caller must have configured a watermark on the
    event-time column — EventTimeTimeout requires one). Default None
    keeps NoTimeout: sessions close only via the gap rule, and a final
    open session per user is never emitted (documented batch-parity
    behavior)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    timeout = (
        GroupStateTimeout.EventTimeTimeout
        if idle_timeout_sec is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_sec, idle_timeout_sec),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
