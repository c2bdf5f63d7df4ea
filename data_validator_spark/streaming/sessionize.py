"""Stateful streaming sessionization via applyInPandasWithState.

The batch analog (queries/analytics.events_sessionized) computes
sessions with window functions; on an unbounded stream that requires
per-key state: this operator keeps one open session per user in the
state store and emits a session row when

- a later event for the user arrives more than ``gap`` past the
  previous one (closed by evidence), or
- the event-time watermark passes ``last_event + gap`` (closed by
  silence — EventTimeTimeout, so closing is driven by data progress,
  deterministic and replayable, never by wall clock).

Scale: state is O(active users) × four scalars; the stream shuffles
once on user_id (the groupBy), Arrow-batched per group — the standard
Spark shape for custom stateful operators.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, session_value double"
)
STATE_SCHEMA = "start long, last long, n long, total double"

_US = 1_000_000


def _emit(user_id, start_us, last_us, n, total) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(last_us, unit="us")],
            "n_events": [n],
            "session_value": [total],
        }
    )


def make_sessionizer(gap_minutes: float = 30.0):
    """Returns the (key, batches, state) function for
    applyInPandasWithState."""
    gap_us = int(gap_minutes * 60 * _US)

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield _emit(user_id, start, last, n, total)
            return

        if state.exists:
            start, last, n, total = state.get
        else:
            start = last = None
            n, total = 0, 0.0

        closed = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for ts, val in zip(pdf["ts"], pdf["value"]):
                us = ts.value // 1000  # pandas ns → µs
                if last is not None and us - last > gap_us:
                    closed.append((start, last, n, total))
                    start, n, total = None, 0, 0.0
                if start is None:
                    start = us
                last = us
                n += 1
                total += float(val)

        state.update((start, last, n, total))
        # close by silence once the watermark passes last + gap; the
        # timestamp must stay ahead of the current watermark
        timeout_ms = max((last + gap_us) // 1000, state.getCurrentWatermarkMs() + 1)
        state.setTimeoutTimestamp(timeout_ms)
        for s in closed:
            yield _emit(user_id, *s)

    return fn


def sessionize_stream(events: DataFrame, gap_minutes: float = 30.0) -> DataFrame:
    """events(user_id, ts, value, …) → closed-session rows.

    Applies a ``gap``-sized watermark on ``ts`` (needed by
    EventTimeTimeout and to bound state for late data).
    """
    wm = events.withWatermark("ts", f"{int(gap_minutes * 60)} seconds")
    return wm.groupBy("user_id").applyInPandasWithState(
        make_sessionizer(gap_minutes),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
