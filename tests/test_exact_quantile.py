"""operators/exact_quantile.py — the bounded-memory exact quantile
engine behind col_quantiles and mad_outliers (exact mode).

The contract under test: results are BIT-IDENTICAL to Spark's exact
``percentile`` aggregate (and therefore to DuckDB's ``quantile_cont``
— they share the sorted-linear-interpolation definition, which the
driver's hash oracle re-proves per round) for any numeric input,
including constant columns, heavy duplicates, adjacent-double ranges,
NULLs, NaNs, and inputs small enough to skip refinement — while the
refinement loop is exercised hard with tiny ``buckets``/``cap``."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from data_validator_spark.operators.exact_quantile import (
    QuantileSpec,
    exact_quantiles,
)

QS = (0.0, 0.01, 0.25, 0.5, 0.75, 0.95, 0.999, 1.0)


def _ref(spark, df, col, qs):
    qarr = "array(" + ", ".join(f"{q}D" for q in qs) + ")"
    return df.agg(
        F.expr(f"CAST(percentile({col}, {qarr}) AS array<double>)")
    ).collect()[0][0]


def _check_bit_exact(spark, values, qs=QS, **kw):
    df = spark.createDataFrame([(v,) for v in values], "x double")
    got = exact_quantiles(df, [QuantileSpec("x", F.col("x"), qs)], **kw)["x"]
    ref = _ref(spark, df, "x", qs)
    if ref is None:
        assert all(v is None for v in got.values)
        return
    for q, g, r in zip(qs, got.values, ref):
        assert g == r, (q, g, r)  # BIT-exact, no tolerance


def test_uniform_random_bit_exact(spark):
    random.seed(11)
    _check_bit_exact(spark, [random.uniform(-1e6, 1e6) for _ in range(5000)])


def test_heavy_duplicates_bit_exact(spark):
    random.seed(13)
    _check_bit_exact(spark, [float(random.randint(0, 5)) for _ in range(3000)])


def test_constant_column(spark):
    _check_bit_exact(spark, [42.5] * 1000)


def test_tiny_range_adjacent_doubles(spark):
    # two adjacent doubles with huge counts: bucketization must still
    # separate them (or resolve via per-bucket min==max)
    lo = 1.0
    hi = math.nextafter(lo, 2.0)
    _check_bit_exact(spark, [lo] * 700 + [hi] * 900, **{"buckets": 4, "cap": 8})


def test_nulls_ignored(spark):
    random.seed(17)
    vals = [random.uniform(0, 100) for _ in range(500)]
    df = spark.createDataFrame(
        [(v,) for v in vals] + [(None,)] * 200, "x double"
    )
    got = exact_quantiles(df, [QuantileSpec("x", F.col("x"), QS)])["x"]
    assert got.n == 500
    ref = _ref(spark, df, "x", QS)
    assert got.values == list(ref)


def test_all_null_column(spark):
    df = spark.createDataFrame([(None,)] * 50, "x double")
    got = exact_quantiles(df, [QuantileSpec("x", F.col("x"), (0.5,))])["x"]
    assert got.n == 0 and got.values == [None]


def test_nan_scrubbed_like_null(spark):
    vals = [1.0, 2.0, 3.0, 4.0, float("nan"), float("nan")]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = exact_quantiles(df, [QuantileSpec("x", F.col("x"), (0.5,))])["x"]
    assert got.n == 4
    assert got.values == [2.5]


def test_extreme_double_range_refines_not_fallback(spark):
    """ADVICE r8: hi - lo overflows to +inf when the column spans
    nearly the whole double range; the halved-arithmetic bucket path
    must still NARROW (refinement resolves under a tiny cap within
    the round budget — no single-task whole-column fallback window)
    and stay bit-exact vs Spark's percentile."""
    random.seed(31)
    vals = [random.uniform(-1.0, 1.0) * 1.7e308 for _ in range(2000)]
    vals[0], vals[1] = -1.7e308, 1.7e308  # pin the overflow endpoints
    assert math.isinf(max(vals) - min(vals))
    _check_bit_exact(
        spark, vals, **{"buckets": 8, "cap": 16, "max_rounds": 64}
    )


def test_infinite_values_refine_not_fallback(spark):
    """ADVICE r9: actual ±inf VALUES used to poison the bucket
    arithmetic (inf/2 - inf/2 is NaN), collapsing every row into
    bucket 0 so refinement could never narrow. The clamped-proxy
    bucketing must still converge under a tiny cap and stay bit-exact
    vs Spark's percentile (which propagates infinities through
    interpolation identically to DuckDB's quantile_cont — probed)."""
    random.seed(37)
    vals = (
        [float("-inf")] * 40
        + [random.uniform(-1e6, 1e6) for _ in range(2000)]
        + [float("inf")] * 40
    )
    _check_bit_exact(
        spark, vals, **{"buckets": 8, "cap": 16, "max_rounds": 64}
    )


def test_single_finite_point_with_infinity_narrows(spark):
    """The degenerate clamped range (finite part is one point, e.g.
    [DBL_MAX, +inf]) must still split infinities from the point in
    one round instead of looping to max_rounds."""
    vals = [1.7976931348623157e308] * 500 + [float("inf")] * 300
    _check_bit_exact(spark, vals, **{"buckets": 8, "cap": 16, "max_rounds": 4})


def test_forced_multi_round_refinement(spark):
    # buckets=2, cap=4 forces log2(n) refinement rounds; max_rounds
    # high enough to converge, values still bit-exact
    random.seed(19)
    vals = [random.uniform(-50, 50) for _ in range(2000)]
    _check_bit_exact(
        spark, vals, **{"buckets": 2, "cap": 4, "max_rounds": 64}
    )


def test_max_rounds_exhaustion_still_exact(spark):
    # with max_rounds=1 the selection window handles an over-cap
    # interval directly — slower, never wrong
    random.seed(23)
    vals = [random.uniform(-50, 50) for _ in range(2000)]
    _check_bit_exact(spark, vals, **{"buckets": 2, "cap": 4, "max_rounds": 1})


def test_multi_column_fused(spark):
    random.seed(29)
    rows = [
        (random.uniform(0, 1), float(random.randint(0, 9)), random.gauss(0, 3))
        for _ in range(4000)
    ]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    got = exact_quantiles(
        df,
        [
            QuantileSpec("a", F.col("a"), QS),
            QuantileSpec("b", F.col("b"), QS),
            QuantileSpec("c", F.col("c"), QS),
        ],
    )
    for c in ("a", "b", "c"):
        ref = _ref(spark, df, c, QS)
        assert got[c].values == list(ref), c


def test_bounds_hint_skips_stats_pass(spark):
    # mad_outliers pattern: derived |x - med| column with known loose
    # bounds — lower bound 0.0 is safe, not tight
    random.seed(31)
    vals = [random.uniform(10, 20) for _ in range(3000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    med = sorted(vals)[len(vals) // 2]
    ad = F.abs(F.col("x") - F.lit(med))
    got = exact_quantiles(
        df,
        [QuantileSpec("ad", ad, (0.5, 0.9), bounds=(len(vals), 0.0, 10.0))],
    )["ad"]
    dfa = df.select(ad.alias("ad"))
    ref = _ref(spark, dfa, "ad", (0.5, 0.9))
    assert got.values == list(ref)


def test_derived_expression_spec(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") * F.col("id")).cast("double").alias("sq")
    )
    got = exact_quantiles(df, [QuantileSpec("sq", F.col("sq"), (0.5,))])["sq"]
    ref = _ref(spark, df, "sq", (0.5,))
    assert got.values == list(ref)


def test_stats_returned(spark):
    df = spark.createDataFrame([(1.0,), (5.0,), (3.0,)], "x double")
    got = exact_quantiles(df, [QuantileSpec("x", F.col("x"), (0.5,))])["x"]
    assert (got.n, got.mn, got.mx) == (3, 1.0, 5.0)
    assert got.values == [3.0]


@pytest.mark.parametrize("n", [1, 2, 3, 5])
def test_tiny_inputs(spark, n):
    random.seed(37 + n)
    _check_bit_exact(spark, [random.uniform(-5, 5) for _ in range(n)])
