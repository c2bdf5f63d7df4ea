"""colstats: count/mean/min/max/stdDev + 10-bin histogram. Mirrors
reference ColStatsSpec + stats aggregator specs."""

from __future__ import annotations

import math
import statistics

import pytest
from pyspark.sql import functions as F

from data_validator_spark.validators.colstats import NUM_BINS, ColStats


def run_colstats(spark, df, chk):
    assert chk.config_check(df) is False
    aggs = [F.count(F.lit(1)).alias("dv_count")] + chk.agg_exprs(df, "qc0")
    row = df.agg(*aggs).collect()[0].asDict()
    chk.evaluate(row, int(row["dv_count"]))
    if chk.needs_second_pass():
        hrow = df.agg(*chk.histogram_exprs()).collect()[0].asDict()
        chk.sink_histogram(hrow)
    return chk


VALUES = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]


@pytest.fixture(scope="module")
def vdf(spark):
    return spark.createDataFrame([(v,) for v in VALUES], "x double")


def test_basic_stats_match_python(spark, vdf):
    chk = run_colstats(spark, vdf, ColStats("x"))
    s = chk.stats
    assert s["count"] == len(VALUES)
    assert s["min"] == min(VALUES) and s["max"] == max(VALUES)
    assert abs(s["mean"] - statistics.mean(VALUES)) < 1e-12
    assert abs(s["stdDev"] - statistics.stdev(VALUES)) < 1e-12


def test_histogram_bins_partition_all_rows(spark, vdf):
    chk = run_colstats(spark, vdf, ColStats("x"))
    bins = chk.stats["histogram"]["bins"]
    assert len(bins) == NUM_BINS
    assert sum(b["count"] for b in bins) == len(VALUES)
    # equi-width edges over [1, 9]
    assert bins[0]["lowerBound"] == 1.0 and bins[-1]["upperBound"] == 9.0
    w = (9.0 - 1.0) / NUM_BINS
    for i, b in enumerate(bins):
        assert math.isclose(b["lowerBound"], 1.0 + i * w)
    # max value lands in the LAST (closed) bin
    assert bins[-1]["count"] >= 1


def test_histogram_counts_match_python(spark, vdf):
    chk = run_colstats(spark, vdf, ColStats("x"))
    bins = chk.stats["histogram"]["bins"]
    lo, hi = min(VALUES), max(VALUES)
    w = (hi - lo) / NUM_BINS
    expected = [0] * NUM_BINS
    for v in VALUES:
        # divide-then-floor, matching Spark and the reference
        # SecondPassStatsAggregator (NOT python's float // which
        # rounds the quotient differently: 4.0//0.8 == 4, floor(4.0/0.8) == 5)
        expected[min(NUM_BINS - 1, math.floor((v - lo) / w))] += 1
    assert [b["count"] for b in bins] == expected


def test_constant_column_single_bin(spark):
    df = spark.createDataFrame([(7.0,)] * 4, "x double")
    chk = run_colstats(spark, df, ColStats("x"))
    bins = chk.stats["histogram"]["bins"]
    assert bins[0]["count"] == 4
    assert sum(b["count"] for b in bins) == 4


def test_all_null_column_skips_second_pass(spark):
    df = spark.createDataFrame([(None,), (None,)], "x double")
    chk = run_colstats(spark, df, ColStats("x"))
    assert chk.stats["count"] == 0
    assert not chk.needs_second_pass()
    assert "histogram" not in chk.stats


def test_colstats_non_numeric_is_config_error(spark):
    df = spark.createDataFrame([("a",)], "s string")
    assert ColStats("s").config_check(df) is True
