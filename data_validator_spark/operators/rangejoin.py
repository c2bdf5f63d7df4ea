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

from pyspark.sql import DataFrame
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
