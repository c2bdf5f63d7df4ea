"""Salted (skew-resistant) aggregations + plan audit helpers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_validator_spark.operators.skew import (
    salted_count_by_key,
    salted_distinct_count,
    salted_duplicate_key_count,
)
from data_validator_spark.plans import audit as pa


@pytest.fixture(scope="module")
def skewed(spark):
    # key 0 holds 90% of rows; keys 1..10 tiny
    rows = [(0, i) for i in range(900)] + [(k, i) for k in range(1, 11) for i in range(10)]
    return spark.createDataFrame(rows, "k int, v int")


def test_salted_count_matches_direct_groupby(spark, skewed):
    direct = {r["k"]: r["count"] for r in skewed.groupBy("k").count().collect()}
    salted = {r["k"]: r["count"] for r in salted_count_by_key(skewed, ["k"]).collect()}
    assert salted == direct


def test_salted_count_is_two_stage(spark, skewed):
    df = salted_count_by_key(skewed, ["k"])
    # two shuffles: (k, salt) partial agg, then k merge
    assert pa.exchange_count(df) >= 2


def test_salted_distinct_count(spark, skewed):
    assert salted_distinct_count(skewed, ["k"]) == 11
    assert salted_distinct_count(skewed, ["k", "v"]) == skewed.distinct().count()


def test_salted_duplicate_key_count_matches_unique_check(spark, skewed):
    expected = (
        skewed.groupBy("k").count().where(F.col("count") > 1).count()
    )
    assert salted_duplicate_key_count(skewed, ["k"]) == expected


def test_audit_reports_plan_shape(spark, skewed):
    a = pa.audit(skewed.groupBy("k").count())
    assert a["exchanges"] >= 1 and a["cartesian"] is False


def test_execute_to_final_plan_is_actually_final(spark, skewed):
    """ADVICE r11: a noop-sink write plans under a NEW QueryExecution,
    so the audited plan stayed isFinalPlan=false — the helper must
    drive the df's OWN QueryExecution and return the finalized AQE
    plan, trimmed to the final-plan section."""
    df = skewed.groupBy("k").count()
    # the un-executed plan is NOT final under AQE
    assert "isFinalPlan=false" in pa.plan_string(df)
    plan = pa.execute_to_final_plan(df)
    assert "isFinalPlan=true" in plan
    assert "== Initial Plan ==" not in plan
    # and the noop-write variant really does leave it unfinalized
    df2 = skewed.groupBy("k").count()
    df2.write.format("noop").mode("overwrite").save()
    assert "isFinalPlan=false" in pa.plan_string(df2)
