"""Scale path for the profiling queries (VERDICT r2 item 5): with
spark.data_validator.approx_profile=true, col_quantiles uses
percentile_approx and profile_table uses approx_count_distinct —
bounded-memory sketches whose plans drop the exact modes' sort
buffers / Expand. Exact remains the default (oracle-checkable)."""

from __future__ import annotations

import pytest

from data_validator_spark.queries.validator_queries import (
    APPROX_PROFILE_CONF,
    q_col_quantiles,
    q_profile_table,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture
def approx(spark):
    spark.conf.set(APPROX_PROFILE_CONF, "true")
    yield spark
    spark.conf.unset(APPROX_PROFILE_CONF)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_quantiles_approx_close_to_exact(approx):
    spark = approx
    ap = {r["column_name"]: r for r in q_col_quantiles(spark, SF).collect()}
    spark.conf.unset(APPROX_PROFILE_CONF)
    ex = {r["column_name"]: r for r in q_col_quantiles(spark, SF).collect()}
    assert set(ap) == set(ex)
    for c in ex:
        for q in ("p25", "p50", "p75", "p95"):
            lo, hi = sorted((ex[c]["p25"], ex[c]["p95"]))
            spread = max(hi - lo, 1e-9)
            assert abs(ap[c][q] - ex[c][q]) <= 0.25 * spread, (c, q)


def test_quantiles_schemas_identical_between_modes(approx):
    spark = approx
    s_ap = q_col_quantiles(spark, SF).schema
    spark.conf.unset(APPROX_PROFILE_CONF)
    assert q_col_quantiles(spark, SF).schema == s_ap


def test_profile_approx_plan_has_no_expand(approx):
    plan = _plan(q_profile_table(approx, SF))
    assert "Expand" not in plan
    assert "approx_count_distinct" in plan


def test_profile_exact_plan_has_expand(spark):
    spark.conf.unset(APPROX_PROFILE_CONF)
    assert "Expand" in _plan(q_profile_table(spark, SF))


def test_profile_approx_counts_within_tolerance(approx):
    spark = approx
    ap = {r["column_name"]: r for r in q_profile_table(spark, SF).collect()}
    spark.conf.unset(APPROX_PROFILE_CONF)
    ex = {r["column_name"]: r for r in q_profile_table(spark, SF).collect()}
    for c in ex:
        assert ap[c]["n_rows"] == ex[c]["n_rows"]
        assert ap[c]["n_nulls"] == ex[c]["n_nulls"]
        assert ap[c]["min_val"] == ex[c]["min_val"]
        assert ap[c]["max_val"] == ex[c]["max_val"]
        rel = abs(ap[c]["n_distinct"] - ex[c]["n_distinct"]) / max(ex[c]["n_distinct"], 1)
        assert rel <= 0.05, (c, ap[c]["n_distinct"], ex[c]["n_distinct"])
