"""Backward as-of join semantics (operators/asof.py): inclusive
timestamp match, deterministic tie-break, NULL when nothing precedes,
and the one-shuffle plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_validator_spark.operators.asof import asof_join


def T(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 100, T("2024-01-01 10:00:00"), 5.0),
            (1, 101, T("2024-01-01 12:00:00"), 6.0),
            (2, 102, T("2024-01-01 09:00:00"), 7.0),  # nothing precedes
            (3, 103, T("2024-01-01 10:00:00"), 8.0),  # exact-ts tie
        ],
        "user_id long, event_id long, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [
            (1, 10, T("2024-01-01 09:30:00")),
            (1, 11, T("2024-01-01 11:00:00")),
            (2, 12, T("2024-01-01 09:30:00")),  # after left's only row
            (3, 13, T("2024-01-01 10:00:00")),  # ts == left ts
            (3, 14, T("2024-01-01 10:00:00")),  # same ts, larger id wins
        ],
        "user_id long, event_id long, ts timestamp",
    )
    return left, right


def test_asof_join_semantics(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on=["user_id"], ts="ts", payload=["event_id", "ts"],
        tiebreak="event_id", prefix="m_",
    )
    rows = {r.event_id: r for r in out.collect()}
    assert len(rows) == 4 and set(out.columns) == {
        "user_id", "event_id", "ts", "value", "m_event_id", "m_ts"
    }
    assert rows[100].m_event_id == 10  # latest at-or-before 10:00
    assert rows[101].m_event_id == 11  # advances to 11:00 click
    assert rows[102].m_event_id is None and rows[102].m_ts is None
    assert rows[103].m_event_id == 14  # inclusive tie, max tiebreak wins


def test_asof_join_plan_is_single_shuffle_window(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on=["user_id"], ts="ts", payload=["event_id"],
        tiebreak="event_id",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan and "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_join_keeps_every_left_row(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on=["user_id"], ts="ts", payload=["event_id"],
        tiebreak="event_id",
    )
    assert out.count() == left.count()
    # left columns pass through unchanged
    got = {(r.user_id, r.event_id, r.value) for r in out.collect()}
    want = {(r.user_id, r.event_id, r.value) for r in left.collect()}
    assert got == want


def test_events_asof_join_gap_is_nonnegative(spark):
    from data_validator_spark.queries.analytics import events_asof_join

    rows = events_asof_join(spark, "/root/testdata/sf0.001").collect()
    assert rows  # purchases exist at every SF
    matched = [r for r in rows if r.click_id is not None]
    assert matched and all(r.gap_us >= 0 for r in matched)


def test_asof_join_matches_pandas_merge_asof_randomized(spark):
    """Randomized cross-check against pandas merge_asof (backward,
    inclusive, last-of-ties — the same semantics)."""
    import random

    import pandas as pd

    rng = random.Random(20260813)
    left_rows = [
        (rng.randrange(5), i, rng.randrange(0, 10_000))
        for i in range(200)
    ]
    right_rows = [
        (rng.randrange(5), 1000 + i, rng.randrange(0, 10_000))
        for i in range(300)
    ]
    left = spark.createDataFrame(
        [(u, i, pd.Timestamp(t, unit="s").to_pydatetime()) for u, i, t in left_rows],
        "user_id long, event_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(u, i, pd.Timestamp(t, unit="s").to_pydatetime()) for u, i, t in right_rows],
        "user_id long, event_id long, ts timestamp",
    )
    got = {
        r.event_id: r.m_event_id
        for r in asof_join(
            left, right, on=["user_id"], ts="ts", payload=["event_id"],
            tiebreak="event_id", prefix="m_",
        ).collect()
    }

    lp = pd.DataFrame(left_rows, columns=["user_id", "event_id", "t"]).sort_values(
        ["t", "event_id"]
    )
    # merge_asof keeps the LAST right row among equal timestamps only if
    # it sorts last — sort by (t, event_id) so max event_id wins ties,
    # matching the operator's tiebreak.
    rp = (
        pd.DataFrame(right_rows, columns=["user_id", "m_event_id", "t"])
        .sort_values(["t", "m_event_id"])
    )
    want_df = pd.merge_asof(
        lp, rp, on="t", by="user_id", direction="backward", allow_exact_matches=True
    )
    want = {
        int(r.event_id): (None if pd.isna(r.m_event_id) else int(r.m_event_id))
        for r in want_df.itertuples()
    }
    assert got == want


# -- asof_self_join (r15: partitioning-preserving single-relation form) -----
def _one_relation(spark):
    """left/right streams folded into one tagged relation: purchases
    carry value, clicks don't (NULL)."""
    rows = [
        # (user_id, event_id, ts, value, event_type)
        (1, 100, T("2024-01-01 10:00:00"), 5.0, "purchase"),
        (1, 101, T("2024-01-01 12:00:00"), 6.0, "purchase"),
        (2, 102, T("2024-01-01 09:00:00"), 7.0, "purchase"),
        (3, 103, T("2024-01-01 10:00:00"), 8.0, "purchase"),
        (1, 10, T("2024-01-01 09:30:00"), None, "click"),
        (1, 11, T("2024-01-01 11:00:00"), None, "click"),
        (2, 12, T("2024-01-01 09:30:00"), None, "click"),
        (3, 13, T("2024-01-01 10:00:00"), None, "click"),
        (3, 14, T("2024-01-01 10:00:00"), None, "click"),
    ]
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double, event_type string"
    )


def test_asof_self_join_matches_generic_semantics(spark):
    from data_validator_spark.operators.asof import asof_self_join

    df = _one_relation(spark)
    out = asof_self_join(
        df,
        on=["user_id"],
        ts="ts",
        left_pred=F.col("event_type") == "purchase",
        right_pred=F.col("event_type") == "click",
        payload=["event_id", "ts"],
        tiebreak="event_id",
        prefix="m_",
    )
    rows = {r.event_id: r for r in out.collect()}
    # same verdicts as test_asof_join_semantics on the equivalent split
    assert len(rows) == 4
    assert rows[100].m_event_id == 10
    assert rows[101].m_event_id == 11
    assert rows[102].m_event_id is None and rows[102].m_ts is None
    assert rows[103].m_event_id == 14  # inclusive tie, max tiebreak wins
    # full-row passthrough: every input column survives for left rows
    assert set(out.columns) == {
        "user_id", "event_id", "ts", "value", "event_type", "m_event_id", "m_ts"
    }


def test_asof_self_join_equals_generic_on_split_frames(spark):
    """The self form must be row-identical to asof_join() of the two
    predicate-filtered frames (the documented equivalence)."""
    from data_validator_spark.operators.asof import asof_self_join

    df = _one_relation(spark)
    generic = asof_join(
        df.where(F.col("event_type") == "purchase"),
        df.where(F.col("event_type") == "click").select("user_id", "event_id", "ts"),
        on=["user_id"], ts="ts", payload=["event_id", "ts"],
        tiebreak="event_id", prefix="m_",
    ).select("event_id", "m_event_id", "m_ts")
    self_form = asof_self_join(
        df, on=["user_id"], ts="ts",
        left_pred=F.col("event_type") == "purchase",
        right_pred=F.col("event_type") == "click",
        payload=["event_id", "ts"], tiebreak="event_id", prefix="m_",
    ).select("event_id", "m_event_id", "m_ts")
    assert sorted(map(tuple, generic.collect())) == sorted(
        map(tuple, self_form.collect())
    )


def test_asof_self_join_preserves_input_partitioning(spark):
    """Over an input already hash-partitioned on the keys, the self
    form must plan WITHOUT any exchange besides the input's own — the
    entire reason it exists (the union form re-shuffles)."""
    df = _one_relation(spark).repartition(4, "user_id")
    from data_validator_spark.operators.asof import asof_self_join

    out = asof_self_join(
        df, on=["user_id"], ts="ts",
        left_pred=F.col("event_type") == "purchase",
        right_pred=F.col("event_type") == "click",
        payload=["event_id"], tiebreak="event_id",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # exactly the one repartition exchange we inserted, nothing added
    assert plan.count("Exchange") == 1


def test_asof_self_join_randomized_against_brute_force(spark):
    """Seeded randomized equivalence: asof_self_join vs an independent
    per-row python reference (inclusive match, right-before-left at
    equal ts, max tiebreak among equal-ts rights) — the tie lattice is
    exactly where window-based implementations go wrong, so the
    generator plants heavy ts collisions on purpose."""
    import random

    from data_validator_spark.operators.asof import asof_self_join

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        rows = []
        eid = 0
        for u in range(6):
            # coarse ts grid -> many exact-tie collisions
            for _ in range(rng.randint(0, 40)):
                ts_us = rng.randint(0, 15) * 1_000_000
                kind = rng.choice(["purchase", "click"])
                rows.append((u, eid, ts_us, kind))
                eid += 1
        if not any(k == "purchase" for *_, k in rows):
            rows.append((0, eid, 0, "purchase"))
        df = spark.createDataFrame(
            [(u, e, dt.datetime(2024, 1, 1) + dt.timedelta(microseconds=t), k)
             for u, e, t, k in rows],
            "user_id long, event_id long, ts timestamp, event_type string",
        )
        got = {
            r.event_id: r.m_event_id
            for r in asof_self_join(
                df, on=["user_id"], ts="ts",
                left_pred=F.col("event_type") == "purchase",
                right_pred=F.col("event_type") == "click",
                payload=["event_id"], tiebreak="event_id", prefix="m_",
            ).collect()
        }
        want = {}
        for u, e, t, k in rows:
            if k != "purchase":
                continue
            elig = [(t2, e2) for u2, e2, t2, k2 in rows
                    if u2 == u and k2 == "click" and t2 <= t]
            want[e] = max(elig)[1] if elig else None
        assert got == want, f"seed {seed}"


def test_asof_self_join_check_disjoint_raises(spark):
    """Right-precedence contract (ADVICE r15): check_disjoint=True
    turns overlapping predicates into an error instead of silently
    dropping the both-matching row from the left output."""
    import datetime as dt

    import pytest
    from pyspark.sql import functions as F

    from data_validator_spark.operators.asof import asof_self_join

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(0, 0, base, 5), (0, 1, base + dt.timedelta(seconds=1), 9)],
        "user_id long, event_id long, ts timestamp, v long",
    )
    with pytest.raises(ValueError, match="not disjoint"):
        asof_self_join(
            df,
            on=["user_id"],
            ts="ts",
            left_pred=F.col("v") >= 5,   # overlaps: v=9 matches both
            right_pred=F.col("v") >= 9,
            payload=["event_id"],
            tiebreak="event_id",
            check_disjoint=True,
        )
    # disjoint predicates pass the check and still join
    out = asof_self_join(
        df,
        on=["user_id"],
        ts="ts",
        left_pred=F.col("v") == 9,
        right_pred=F.col("v") == 5,
        payload=["event_id"],
        tiebreak="event_id",
        check_disjoint=True,
    ).collect()
    assert [(r.event_id, r.asof_event_id) for r in out] == [(1, 0)]
