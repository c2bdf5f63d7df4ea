"""Bucketed range join — the scale path for big-big temporal joins.

Spark executes a raw non-equi condition like
``l.user = r.user AND abs(l.ts - r.ts) <= tol`` as a SortMergeJoin on
the equality key alone, re-scanning every right row that shares the
key for each left row — quadratic in per-key event counts, which is
exactly what explodes on hot users at 100 TB.

The bucketed form makes the time predicate part of the JOIN KEY: bin
both sides to ``tol``-sized buckets, explode the probe side to its
bucket and the two neighbors (any |Δt| <= tol match lies in them),
equi-join on (keys…, bucket), then apply the exact tolerance filter.
The join becomes a plain hash/sort-merge equi-join with 3× probe-side
fan-out — linear, shuffle on (keys…, bucket), AQE-splittable. The
same trick with grid cells is how spatial joins scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join_count(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str],
    ts: str,
    tolerance_us: int,
    count_alias: str = "n_matches",
) -> DataFrame:
    """Count, for every probe row, the build rows within
    ``tolerance_us`` microseconds on the same ``on`` keys. Returns the
    probe rows + ``count_alias`` (0 when nothing is near).

    The count aggregates per (probe keys, bucket) BEFORE the probe
    explosion is resolved — but correctness needs the exact |Δt|
    filter per pair, so the pair relation materializes only as the
    grouped count input, never as output.
    """
    on = list(on)
    # integer `div`, not floor(float division): µs values are exact in
    # a double today, but the operator is generic — integer bucket
    # arithmetic has no precision cliff (same reasoning as the ns→µs
    # loader fix)
    built = build.select(
        *on,
        F.expr(f"unix_micros({ts}) div {int(tolerance_us)}").alias("_bucket"),
        F.unix_micros(F.col(ts)).alias("_build_us"),
    )
    probe_keyed = (
        probe.select(
            F.struct(*probe.columns).alias("_row"),
            # unique per-row tag so IDENTICAL probe rows stay distinct
            # output rows instead of collapsing in the final groupBy
            F.monotonically_increasing_id().alias("_uid"),
            *[F.col(c) for c in on],
            F.unix_micros(F.col(ts)).alias("_probe_us"),
        )
        .withColumn("_pb", F.expr(f"_probe_us div {int(tolerance_us)}"))
        .withColumn(
            "_bucket",
            F.explode(F.array(F.col("_pb") - 1, F.col("_pb"), F.col("_pb") + 1)),
        )
        .drop("_pb")
    )
    pairs = probe_keyed.join(built, on=[*on, "_bucket"], how="left").where(
        F.col("_build_us").isNull()
        | (F.abs(F.col("_build_us") - F.col("_probe_us")) <= tolerance_us)
    )
    counted = pairs.groupBy("_row", "_uid").agg(
        F.count("_build_us").alias(count_alias)
    )
    out_cols = [F.col(f"_row.{c}").alias(c) for c in probe.columns]
    return counted.select(*out_cols, count_alias)


def range_count_self(
    df: DataFrame,
    on: Sequence[str],
    ts: str,
    probe_pred,
    build_pred,
    tolerance_us: int,
    count_alias: str = "n_matches",
) -> DataFrame:
    """The partitioning-preserving form of `range_join_count` for the
    common case where probe and build rows are subsets of ONE relation
    (errors vs clicks of the same events table): a RANGE-framed window
    over the shared keys replaces the bucket-explode equi-join
    entirely.

    Why (SCALE.md r14→r15): the generic form's probe explosion + pair
    join + per-probe groupBy re-shuffles on (keys…, bucket) even when
    the input scan is already hash-partitioned on `on` (the at-rest
    bucketed events copy). Here the count is
    ``sum(build_pred) OVER (PARTITION BY on ORDER BY unix_micros(ts)
    RANGE BETWEEN -tol AND +tol)`` evaluated at probe rows: one
    in-bucket sort, a sliding frame Spark maintains incrementally
    (add/evict per row — linear, never per-pair), ZERO exchanges over
    a bucketed scan, and no 3× row fan-out. Bounds are inclusive on
    both ends, matching the generic form's |Δt| <= tol.

    Predicates need not be disjoint: a row matching both contributes
    to its own count, exactly as it would match itself in the generic
    two-input form when the same relation is passed twice."""
    on = list(on)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.unix_micros(F.col(ts)))
        .rangeBetween(-int(tolerance_us), int(tolerance_us))
    )
    # three-valued logic guard (ADVICE r15): build_pred over a nullable
    # column can evaluate to NULL; a frame holding only NULL-predicate
    # rows must count 0 — the generic form's left join yields 0 there —
    # so map the predicate through when/otherwise instead of cast
    # (sum(CAST(NULL AS LONG)) over an all-NULL frame is NULL, not 0)
    return (
        df.where(probe_pred | build_pred)
        .select(
            *df.columns,
            F.sum(F.when(build_pred, F.lit(1)).otherwise(F.lit(0)))
            .over(w)
            .alias(count_alias),
            probe_pred.alias("_is_probe"),
        )
        .where(F.col("_is_probe"))
        .drop("_is_probe")
    )
