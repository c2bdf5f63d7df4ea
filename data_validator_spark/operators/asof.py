"""Backward as-of join — an operator Spark lacks natively (DuckDB/kdb
have ASOF JOIN; pandas has merge_asof).

Expressed as a composition of built-in DataFrame ops (SURVEY custom-
operator rule (a)): tag both inputs, union, and carry the latest right
row forward with one `last(..., ignorenulls=True)` window — so the
whole join costs ONE shuffle on the partition keys and never builds a
range self-join. At 100 TB this is the difference between a sort
within each user's partition and an O(n·m) non-equi join: the union
plan is `Exchange(keys) → Sort(keys, ts) → Window → Filter`, all
whole-stage-codegen, and AQE's skew handling applies to the single
exchange.

Tie semantics (deterministic by construction, unlike SQL ASOF ties):
right rows with ts equal to a left row's ts DO match (inclusive), and
among right rows sharing the max eligible ts the one with the largest
`tiebreak` value wins. Right rows order before left rows at equal ts
via a stream tag in the sort key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts: str,
    payload: Sequence[str],
    tiebreak: str,
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach `payload` columns of the latest right
    row with right[ts] <= left[ts] within the same `on` keys (NULLs
    when no right row precedes). `tiebreak` must be a right column,
    unique per (on, ts) group and castable to long — it makes equal-ts
    matches deterministic. Payload columns come back as `prefix+name`.
    """
    on = list(on)
    payload = list(payload)
    carry_type = StructType(right.select(*payload).schema.fields)
    row_type = StructType(left.schema.fields)
    lhs = left.select(
        *on,
        ts,
        F.lit(1).alias("_stream"),
        F.lit(None).cast("long").alias("_tb"),
        F.lit(None).cast(carry_type).alias("_carry"),
        F.struct(*left.columns).alias("_row"),
    )
    rhs = right.select(
        *on,
        ts,
        F.lit(0).alias("_stream"),
        F.col(tiebreak).cast("long").alias("_tb"),
        F.struct(*payload).alias("_carry"),
        F.lit(None).cast(row_type).alias("_row"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts).asc(), F.col("_stream").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        lhs.unionByName(rhs)
        .withColumn("_match", F.last("_carry", ignorenulls=True).over(w))
        .where(F.col("_stream") == 1)
    )
    out_cols = [F.col(f"_row.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_match.{p}").alias(f"{prefix}{p}") for p in payload]
    return matched.select(*out_cols)


def asof_self_join(
    df: DataFrame,
    on: Sequence[str],
    ts: str,
    left_pred,
    right_pred,
    payload: Sequence[str],
    tiebreak: str,
    prefix: str = "asof_",
    check_disjoint: bool = False,
) -> DataFrame:
    """The partitioning-preserving form of `asof_join` for the common
    case where BOTH streams are row subsets of ONE relation (purchases
    vs clicks of the same events table, trades vs quotes of one tape):
    tag rows in place with predicates instead of filtering into two
    DataFrames and unioning them back.

    Why it exists (SCALE.md r14→r15): Spark's Union node reports
    UnknownPartitioning even over identically-partitioned children, so
    the generic tagged-union plan re-shuffles on `on` even when the
    input scan is already hash-partitioned on those keys (the at-rest
    bucketed events copy). Tagging with a projection keeps the child's
    outputPartitioning, so over a bucketed scan the whole join plans
    as Filter → Sort(within buckets) → Window — ZERO exchanges.

    RIGHT-PRECEDENCE contract (ADVICE r15, made explicit): a row
    matching BOTH predicates joins the right stream only — it carries
    payload to later left rows but does not come back as a left output
    row. The equivalence with the generic form is therefore exact as
    `asof_join(df.where(left_pred & ~right_pred),
    df.where(right_pred), ...)`; callers wanting a both-matching row
    on both sides must use `asof_join` with two explicit filters.
    `check_disjoint=True` turns a contract violation into an error
    (one extra count job — debug tool, not for production plans).
    Output: the full `df` row for each left row, plus `prefix+payload`
    columns from the latest right row with right[ts] <= left[ts]
    (inclusive; among equal-ts right rows the largest `tiebreak` wins,
    and right rows order before left rows at equal ts — the same tie
    rules as `asof_join`).
    """
    on = list(on)
    payload = list(payload)
    if check_disjoint:
        n_both = df.where(left_pred & right_pred).limit(1).count()
        if n_both:
            raise ValueError(
                "asof_self_join predicates are not disjoint: at least one "
                "row matches both left_pred and right_pred and would be "
                "routed to the right stream only (right-precedence). Use "
                "asof_join with explicit filters if that row must appear "
                "on both sides."
            )
    tagged = df.where(left_pred | right_pred).select(
        *df.columns,
        F.when(right_pred, 0).otherwise(1).alias("_stream"),
        F.when(right_pred, F.col(tiebreak).cast("long")).alias("_tb"),
        F.when(right_pred, F.struct(*payload)).alias("_carry"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts).asc(), F.col("_stream").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        tagged.withColumn("_match", F.last("_carry", ignorenulls=True).over(w))
        .where(F.col("_stream") == 1)
    )
    out_cols = [F.col(c) for c in df.columns]
    out_cols += [F.col(f"_match.{p}").alias(f"{prefix}{p}") for p in payload]
    return matched.select(*out_cols)
