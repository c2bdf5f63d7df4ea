"""Bucketed range join (operators/rangejoin.py): count correctness at
bucket boundaries, probes with zero matches, and the equi-join plan."""

from __future__ import annotations

import datetime as dt

from data_validator_spark.operators.rangejoin import range_join_count

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def us(seconds):
    return T0 + dt.timedelta(seconds=seconds)


def _frames(spark):
    probe = spark.createDataFrame(
        [
            (1, 100, us(0)),     # builds at -10s, +5s, +10s, +10.000001s
            (1, 101, us(1000)),  # nothing anywhere near
            (2, 102, us(0)),     # no builds for user at all
        ],
        "user_id long, event_id long, ts timestamp",
    )
    build = spark.createDataFrame(
        [
            (1, us(-10)),
            (1, us(5)),
            (1, us(10)),          # exactly at tolerance -> inclusive
            (1, us(10.000001)),   # 1 µs past tolerance -> excluded
            (1, us(500)),         # far from both probes
        ],
        "user_id long, ts timestamp",
    )
    return probe, build


def test_range_join_counts_with_boundary_inclusive(spark):
    probe, build = _frames(spark)
    out = range_join_count(
        probe, build, on=["user_id"], ts="ts", tolerance_us=10_000_000
    )
    got = {r.event_id: r.n_matches for r in out.collect()}
    assert got == {100: 3, 101: 0, 102: 0}


def test_range_join_keeps_probe_columns_and_rowcount(spark):
    probe, build = _frames(spark)
    out = range_join_count(
        probe, build, on=["user_id"], ts="ts", tolerance_us=10_000_000
    )
    assert out.count() == probe.count()
    assert set(out.columns) == {"user_id", "event_id", "ts", "n_matches"}


def test_range_join_plan_is_equi_join(spark):
    probe, build = _frames(spark)
    out = range_join_count(
        probe, build, on=["user_id"], ts="ts", tolerance_us=10_000_000
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the time predicate is in the join KEY (bucket), not a nested loop
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "_bucket" in plan


def test_events_range_join_matches_brute_force(spark):
    from data_validator_spark.queries.analytics import (
        RANGE_TOL_US,
        events_range_join,
    )
    from data_validator_spark.queries import load

    sf = "/root/testdata/sf0.001"
    got = {r.error_id: r.n_nearby_clicks for r in events_range_join(spark, sf).collect()}

    ev = load(spark, sf, "events").collect()
    clicks = [(r.user_id, r.ts) for r in ev if r.event_type == "click"]
    for r in ev:
        if r.event_type != "error":
            continue
        want = sum(
            1
            for u, ts in clicks
            if u == r.user_id
            and abs((ts - r.ts).total_seconds()) * 1_000_000 <= RANGE_TOL_US
        )
        assert got[r.event_id] == want


def test_range_join_preserves_duplicate_probe_rows(spark):
    """Two identical probe rows must come back as two rows, each with
    its own count — not collapse into one inflated row."""
    probe = spark.createDataFrame(
        [(1, us(0)), (1, us(0))], "user_id long, ts timestamp"
    )
    build = spark.createDataFrame([(1, us(5))], "user_id long, ts timestamp")
    out = range_join_count(
        probe, build, on=["user_id"], ts="ts", tolerance_us=10_000_000
    ).collect()
    assert len(out) == 2
    assert [r.n_matches for r in out] == [1, 1]


# -- range_count_self (r15: partitioning-preserving single-relation form) ---
def _one_relation(spark):
    rows = [
        # probe rows (errors)
        (1, 100, us(0), "error"),
        (1, 101, us(1000), "error"),
        (2, 102, us(0), "error"),
        # build rows (clicks)
        (1, None, us(-10), "click"),
        (1, None, us(5), "click"),
        (1, None, us(10), "click"),          # exactly at tolerance -> inclusive
        (1, None, us(10.000001), "click"),   # 1 µs past -> excluded
        (1, None, us(500), "click"),
    ]
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )


def test_range_count_self_boundary_inclusive(spark):
    from pyspark.sql import functions as F

    from data_validator_spark.operators.rangejoin import range_count_self

    df = _one_relation(spark)
    out = range_count_self(
        df, on=["user_id"], ts="ts",
        probe_pred=F.col("event_type") == "error",
        build_pred=F.col("event_type") == "click",
        tolerance_us=10_000_000,
    )
    got = {r.event_id: r.n_matches for r in out.collect()}
    assert got == {100: 3, 101: 0, 102: 0}


def test_range_count_self_equals_generic_on_split_frames(spark):
    from pyspark.sql import functions as F

    from data_validator_spark.operators.rangejoin import range_count_self

    df = _one_relation(spark)
    generic = range_join_count(
        df.where(F.col("event_type") == "error").select("user_id", "event_id", "ts"),
        df.where(F.col("event_type") == "click").select("user_id", "ts"),
        on=["user_id"], ts="ts", tolerance_us=10_000_000,
    ).select("event_id", "n_matches")
    self_form = range_count_self(
        df, on=["user_id"], ts="ts",
        probe_pred=F.col("event_type") == "error",
        build_pred=F.col("event_type") == "click",
        tolerance_us=10_000_000,
    ).select("event_id", "n_matches")
    assert sorted(map(tuple, generic.collect())) == sorted(
        map(tuple, self_form.collect())
    )


def test_range_count_self_is_window_only_no_join_no_fanout(spark):
    from pyspark.sql import functions as F

    from data_validator_spark.operators.rangejoin import range_count_self

    df = _one_relation(spark).repartition(4, "user_id")
    out = range_count_self(
        df, on=["user_id"], ts="ts",
        probe_pred=F.col("event_type") == "error",
        build_pred=F.col("event_type") == "click",
        tolerance_us=10_000_000,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # only the repartition we inserted
    assert "Join" not in plan and "Generate" not in plan
    assert "Window" in plan


def test_range_count_self_randomized_against_brute_force(spark):
    """Seeded randomized equivalence vs a per-row python reference
    (|Δt| <= tol inclusive, same user) — boundary collisions planted
    by generating timestamps on a grid equal to the tolerance."""
    import datetime as _dt
    import random

    from pyspark.sql import functions as F

    from data_validator_spark.operators.rangejoin import range_count_self

    TOL = 2_000_000  # 2s
    for seed in (5, 41, 77):
        rng = random.Random(seed)
        rows = []
        eid = 0
        for u in range(5):
            for _ in range(rng.randint(0, 35)):
                # half the points land exactly ON the tolerance grid
                t = rng.randint(0, 12) * TOL // rng.choice([1, 2])
                rows.append((u, eid, t, rng.choice(["error", "click"])))
                eid += 1
        if not any(k == "error" for *_, k in rows):
            rows.append((0, eid, 0, "error"))
        df = spark.createDataFrame(
            [(u, e, _dt.datetime(2024, 1, 1) + _dt.timedelta(microseconds=t), k)
             for u, e, t, k in rows],
            "user_id long, event_id long, ts timestamp, event_type string",
        )
        got = {
            r.event_id: r.n_matches
            for r in range_count_self(
                df, on=["user_id"], ts="ts",
                probe_pred=F.col("event_type") == "error",
                build_pred=F.col("event_type") == "click",
                tolerance_us=TOL,
            ).collect()
        }
        want = {
            e: sum(1 for u2, _e2, t2, k2 in rows
                   if u2 == u and k2 == "click" and abs(t2 - t) <= TOL)
            for u, e, t, k in rows if k == "error"
        }
        assert got == want, f"seed {seed}"


def test_range_count_self_null_predicate_counts_zero(spark):
    """Three-valued-logic guard (ADVICE r15): a probe row whose frame
    holds only rows where build_pred evaluates to NULL must count 0,
    matching range_join_count's left-join form — not NULL."""
    import datetime as _dt

    from pyspark.sql import functions as F

    from data_validator_spark.operators.rangejoin import range_count_self

    base = _dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            # user 0: one probe, one NULL-kind row nearby (pred -> NULL)
            (0, 0, base, "error"),
            (0, 1, base + _dt.timedelta(seconds=1), None),
            # user 1: a real click inside tolerance sanity-checks the path
            (1, 2, base, "error"),
            (1, 3, base + _dt.timedelta(seconds=1), "click"),
        ],
        "user_id long, event_id long, ts timestamp, event_type string",
    )
    got = {
        r.event_id: r.n_matches
        for r in range_count_self(
            df,
            on=["user_id"],
            ts="ts",
            probe_pred=F.col("event_type") == "error",
            build_pred=F.col("event_type") == "click",
            tolerance_us=2_000_000,
        ).collect()
    }
    assert got == {0: 0, 2: 1}
