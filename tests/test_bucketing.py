"""Bucketed co-located join: the executed plan must contain zero
Exchange when both sides are bucketed on the join key with the same
bucket count (the 100 TB fact⨝fact pattern from SURVEY §4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_validator_spark.operators.bucketing import (
    assert_colocated,
    bucketed_join,
    write_bucketed,
)


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    left = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("a")
    )
    right = spark.range(0, 10_000, 2).select(
        F.col("id").alias("k"), (F.col("id") % 11).alias("b")
    )
    write_bucketed(left, "bk_left", ["k"], 8, path=str(tmp_path / "l"))
    write_bucketed(right, "bk_right", ["k"], 8, path=str(tmp_path / "r"))
    yield "bk_left", "bk_right"
    spark.sql("DROP TABLE IF EXISTS bk_left")
    spark.sql("DROP TABLE IF EXISTS bk_right")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    ln, rn = bucketed_pair
    joined = bucketed_join(spark, ln, rn, ["k"])
    assert_colocated(joined)  # raises if any Exchange is planned
    assert joined.count() == 5_000


def test_assert_colocated_catches_mismatched_buckets(spark, tmp_path):
    df = spark.range(100).select(F.col("id").alias("k"))
    write_bucketed(df, "bk_m1", ["k"], 4, path=str(tmp_path / "m1"))
    write_bucketed(df, "bk_m2", ["k"], 6, path=str(tmp_path / "m2"))
    try:
        joined = bucketed_join(spark, "bk_m1", "bk_m2", ["k"])
        with pytest.raises(AssertionError, match="NOT co-located"):
            assert_colocated(joined)
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_m1")
        spark.sql("DROP TABLE IF EXISTS bk_m2")
