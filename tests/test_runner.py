"""Runner orchestration: single-pass fusion, the one-scan detailed
errors pass, uniqueCheck, and run_config fatal semantics. Mirrors
reference ValidatorTableSpec / Main fatal handling."""

from __future__ import annotations

import pytest

from data_validator_spark.config import TableConfig, ValidatorConfig
from data_validator_spark.events import QuickCheckError
from data_validator_spark.runner import ValidatorTableRunner, run_config
from data_validator_spark.validators.colstats import ColStats
from data_validator_spark.validators.row_based import NegativeCheck, NullCheck, RangeCheck
from data_validator_spark.validators.unique import UniqueCheck

from .conftest import DFSource


@pytest.fixture(scope="module")
def tdf(spark):
    rows = [
        (1, 1, 10.0, None),
        (2, 1, -4.0, "b"),
        (3, 2, 99.0, "c"),
        (4, 2, -1.0, None),
        (1, 1, 3.0, "e"),  # duplicate (k1,k2)
    ]
    return spark.createDataFrame(rows, "k1 int, k2 int, v double, s string")


class count_jobs:
    """Count Spark jobs for a block. AQE is disabled inside (it splits
    one action into one job per query stage, hiding the actions-per-
    table design this asserts)."""

    def __init__(self, spark, group):
        self.spark, self.group = spark, group

    def __enter__(self):
        self._aqe = self.spark.conf.get("spark.sql.adaptive.enabled", "true")
        self.spark.conf.set("spark.sql.adaptive.enabled", "false")
        self.spark.sparkContext.setJobGroup(self.group, self.group, False)
        return self

    def __exit__(self, *exc):
        self.spark.sparkContext.setJobGroup(None, None, False)
        self.spark.conf.set("spark.sql.adaptive.enabled", self._aqe)

    @property
    def n(self):
        return len(self.spark.sparkContext.statusTracker().getJobIdsForGroup(self.group))


def test_quick_checks_fuse_into_one_job(spark, tdf):
    """N cheap checks (no colstats) → exactly ONE Spark job."""
    runner = ValidatorTableRunner(
        DFSource(tdf.coalesce(1), key_columns=["k1", "k2"]),
        [NullCheck("s"), NegativeCheck("v"), RangeCheck("v", 0.0, 100.0, inclusive=True)],
        detailed_errors=False,
    )
    with count_jobs(spark, "fusion-test") as cj:
        runner.quick_checks(spark)
    assert cj.n == 1, f"expected 1 fused job, saw {cj.n}"


def test_colstats_second_pass_is_one_extra_job(spark, tdf):
    runner = ValidatorTableRunner(
        DFSource(tdf.coalesce(1)),
        [ColStats("v"), ColStats("k1"), NullCheck("s")],
        detailed_errors=False,
    )
    with count_jobs(spark, "colstats-test") as cj:
        runner.quick_checks(spark)
    assert cj.n == 2, "fused pass + ONE shared histogram pass"


def test_detailed_errors_single_or_pass(spark, tdf):
    """Two failed checks → ONE extra scan; every sampled row reported
    under every failed check (reference quickErrorDetails parity)."""
    nullc, negc = NullCheck("s"), NegativeCheck("v")
    runner = ValidatorTableRunner(
        DFSource(tdf.coalesce(1), key_columns=["k1", "k2"]),
        [nullc, negc],
        num_errors_to_report=10,
        detailed_errors=True,
    )
    with count_jobs(spark, "detail-test") as cj:
        assert runner.quick_checks(spark) is True
    assert cj.n == 2, f"fused pass + ONE detailed-errors pass, saw {cj.n}"

    # 3 rows fail (s null OR v<0): each sampled row is reported under
    # BOTH failed checks, keys projected
    null_errors = [e for e in nullc.events if isinstance(e, QuickCheckError)]
    neg_errors = [e for e in negc.events if isinstance(e, QuickCheckError)]
    assert len(null_errors) == len(neg_errors) == 3
    assert set(null_errors[0].key) == {"k1", "k2"}


def test_detailed_errors_respects_num_errors_to_report(spark, tdf):
    nullc = NullCheck("s")
    runner = ValidatorTableRunner(
        DFSource(tdf), [nullc], num_errors_to_report=1, detailed_errors=True
    )
    runner.quick_checks(spark)
    assert len([e for e in nullc.events if isinstance(e, QuickCheckError)]) == 1


def test_unique_check_finds_duplicates(spark, tdf):
    chk = UniqueCheck(["k1", "k2"])
    runner = ValidatorTableRunner(DFSource(tdf), [chk])
    assert runner.costly_checks(spark) is True


def test_unique_check_passes_on_unique_keys(spark, tdf):
    chk = UniqueCheck(["k1", "k2", "v"])
    runner = ValidatorTableRunner(DFSource(tdf), [chk])
    assert runner.costly_checks(spark) is False


def test_config_check_catches_missing_key_column(spark, tdf):
    runner = ValidatorTableRunner(DFSource(tdf, key_columns=["nope"]), [NullCheck("s")])
    assert runner.config_check(spark) is True


def test_run_config_config_failure_is_fatal_for_all_tables(spark, tdf, tmp_path):
    """A configCheck failure on ANY table skips the data phases for
    ALL tables (reference Main fatal semantics), still emits report."""
    p = str(tmp_path / "t.parquet")
    tdf.write.parquet(p)
    cfg = ValidatorConfig(
        tables=[
            TableConfig({"parquetFile": p}, [{"type": "nullCheck", "column": "missing_col"}]),
            TableConfig({"parquetFile": p}, [{"type": "nullCheck", "column": "s"}]),
        ]
    )
    report = run_config(spark, cfg)
    assert report["failed"] is True
    good_table = report["tables"][1]
    # data phase skipped: the good table's check has NO check events
    check_events = [
        e for c in good_table["checks"] for e in c["events"] if e["type"] == "checkEvent"
    ]
    assert check_events == []


def test_run_config_happy_path(spark, tdf, tmp_path):
    p = str(tmp_path / "t2.parquet")
    tdf.write.parquet(p)
    cfg = ValidatorConfig(
        tables=[
            TableConfig(
                {"parquetFile": p, "keyColumns": ["k1", "k2"]},
                [
                    {"type": "nullCheck", "column": "s", "threshold": "50%"},
                    {"type": "rowCount", "minNumRows": 2},
                ],
            )
        ]
    )
    report = run_config(spark, cfg)
    assert report["failed"] is False
    assert report["tables"][0]["checks"][0]["type"] == "nullCheck"


def test_condition_filters_rows(spark, tdf):
    src = DFSource(tdf, condition="v > 0")
    runner = ValidatorTableRunner(src, [NegativeCheck("v")])
    assert runner.quick_checks(spark) is False  # negatives filtered out
