"""Kernel-level tests for the vectorized streaming sessionizer
(streaming/sessionize.py, rewritten r7 from a per-row loop to numpy
segment reduction). Drives make_sessionizer's group function directly
with a fake GroupState — no Spark — so hypothesis can hammer the
splitting logic: random event times, multi-trigger state carry-over,
batch-seam ordering, and timeout flushes, all compared against a
straightforward per-event reference implementation."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_validator_spark.streaming.sessionize import make_sessionizer

GAP_MIN = 30.0
GAP_US = int(GAP_MIN * 60 * 1_000_000)


class FakeState:
    """Minimal GroupState stand-in for driving fn outside Spark."""

    def __init__(self):
        self._val = None
        self.hasTimedOut = False
        self.timeout_ms = None
        self.watermark_ms = 0

    @property
    def exists(self):
        return self._val is not None

    @property
    def get(self):
        return self._val

    def update(self, v):
        self._val = tuple(v)

    def remove(self):
        self._val = None

    def getCurrentWatermarkMs(self):
        return self.watermark_ms

    def setTimeoutTimestamp(self, ms):
        self.timeout_ms = ms


def reference_sessions(event_us: list[int]) -> list[tuple[int, int, int]]:
    """(start_us, end_us, n_events) per session, gap-split on sorted
    times — the definition both the kernel and the SQL oracle model."""
    out = []
    start = last = None
    n = 0
    for us in sorted(event_us):
        if last is not None and us - last > GAP_US:
            out.append((start, last, n))
            start, n = None, 0
        if start is None:
            start = us
        last = us
        n += 1
    if start is not None:
        out.append((start, last, n))
    return out


def run_kernel(triggers: list[list[int]]) -> list[tuple[int, int, int]]:
    """Feed event-time lists through fn trigger by trigger, then flush
    by timeout; return emitted (start_us, end_us, n) sorted."""
    fn = make_sessionizer(GAP_MIN)
    state = FakeState()
    emitted: list[tuple[int, int, int]] = []

    def collect(frames):
        for f in frames:
            for _, r in f.iterrows():
                emitted.append(
                    (
                        r["session_start"].value // 1000,
                        r["session_end"].value // 1000,
                        int(r["n_events"]),
                    )
                )

    for batch_events in triggers:
        if not batch_events:
            continue
        pdf = pd.DataFrame(
            {
                "user_id": [1] * len(batch_events),
                "ts": pd.to_datetime(batch_events, unit="us"),
                "value": [1.0] * len(batch_events),
            }
        )
        collect(fn((1,), iter([pdf]), state))
    if state.exists:
        state.hasTimedOut = True
        collect(fn((1,), iter([]), state))
    return sorted(emitted)


def test_single_trigger_multiple_sessions():
    h = 3_600_000_000  # 1h in µs
    events = [0, 60_000_000, h, h + 1, 3 * h]
    assert run_kernel([events]) == sorted(reference_sessions(events))


def test_batch_seam_out_of_order():
    """A group spanning two Arrow batches arrives in shuffle order —
    the kernel must sort across the seam (the r7 rewrite fixed a
    latent per-batch-sort mis-split here)."""
    h = 3_600_000_000
    fn = make_sessionizer(GAP_MIN)
    state = FakeState()
    emitted = []
    # batch 2 holds EARLIER events than batch 1
    b1 = pd.DataFrame({"user_id": [1, 1], "ts": pd.to_datetime([2 * h, 2 * h + 5], unit="us"), "value": [1.0, 1.0]})
    b2 = pd.DataFrame({"user_id": [1, 1], "ts": pd.to_datetime([0, 10], unit="us"), "value": [1.0, 1.0]})
    for f in fn((1,), iter([b1, b2]), state):
        for _, r in f.iterrows():
            emitted.append((r["session_start"].value // 1000, r["session_end"].value // 1000, int(r["n_events"])))
    # the early pair closed (gap to 2h), the late pair stays open
    assert emitted == [(0, 10, 2)]
    assert state.get[:3] == (2 * h, 2 * h + 5, 2)


def test_state_carry_continuation_and_close():
    h = 3_600_000_000
    # trigger 1 leaves an open session; trigger 2 continues it within
    # the gap, trigger 3 breaks it
    got = run_kernel([[0, 1_000_000], [2_000_000], [h]])
    assert got == sorted(reference_sessions([0, 1_000_000, 2_000_000, h]))


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=20 * 3_600_000_000),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_kernel_matches_reference_on_random_streams(event_us, n_triggers):
    """Arbitrary event times split across ORDERED triggers (event-time
    monotonic across triggers, as the watermark guarantees on the real
    stream; arbitrary order within a trigger) must emit exactly the
    reference gap-split sessions."""
    ordered = sorted(event_us)
    # cut into n_triggers contiguous chunks
    k = len(ordered)
    bounds = [round(i * k / n_triggers) for i in range(n_triggers + 1)]
    triggers = [ordered[bounds[i]:bounds[i + 1]] for i in range(n_triggers)]
    # shuffle within each trigger deterministically (shuffle order)
    triggers = [list(reversed(t)) for t in triggers]
    assert run_kernel(triggers) == sorted(reference_sessions(event_us))


def test_timeout_emits_open_session_once():
    got = run_kernel([[5_000_000]])
    assert got == [(5_000_000, 5_000_000, 1)]
