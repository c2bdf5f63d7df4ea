"""Bucketed co-located joins (SURVEY §4: "bucketing for co-located
joins").

At 100 TB the dominant cost of a fact⨝fact join is the shuffle of both
sides. If both tables are written bucketed (and sorted) on the join
key with the same bucket count, Spark's scan exposes the bucketing as
the join's required hash partitioning and the SortMergeJoin runs with
ZERO Exchange — each task reads matching bucket files from both sides.
That's the pattern these helpers package; the plan property is
asserted in tests/test_bucketing.py.

Parity note: the reference (a single-pass validator over one table at
a time, ValidatorTable.scala) never joins tables, so this operator is
part of the beyond-reference scale surface, not reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    num_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` bucketed (and by default sorted) on ``keys``.

    Bucket count must match across tables that will join; sorting
    inside buckets lets SortMergeJoin skip its per-task sort too.
    ``path`` makes the table external (data at ``path``, metadata in
    the session catalog)."""
    w = df.write.format("parquet").mode("overwrite").bucketBy(num_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left: str, right: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket keys.

    Pinned to SortMergeJoin (merge hint): this helper exists for
    fact⨝fact joins where neither side fits in a broadcast — without
    the hint the planner broadcasts small test-scale tables and
    ignores the bucketing entirely. With matching bucketing the SMJ
    plans with ZERO Exchange; ``assert_colocated`` verifies the
    property instead of trusting it."""
    return spark.table(left).hint("merge").join(spark.table(right), on=on, how=how)


def assert_colocated(df: DataFrame) -> None:
    """Raise if the join plan re-shuffles either side — the signal that
    bucket counts or keys don't line up and the write must be fixed
    (silently eating two 100 TB shuffles is the failure mode this
    guards against)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange" in plan:
        raise AssertionError(
            "bucketed join is NOT co-located (Exchange present):\n" + plan
        )
