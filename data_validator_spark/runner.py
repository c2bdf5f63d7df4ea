"""Table runner: executes all checks of a table with minimal scans.

Parity: reference ValidatorTable.scala —
  1. configCheck (schema-only, no data),
  2. quickChecks: ONE aggregation job fusing count(1) plus every
     cheap check's aggregate expressions (ValidatorTable.quickChecks),
  3. optional colstats second pass (histogram bins need pass-1
     min/max; SecondPassStatsAggregator parity),
  4. detailed-errors pass sampling failing rows projected onto key
     columns (ValidatorTable.quickErrorDetails),
  5. costly checks (uniqueCheck) as standalone jobs.

Scale notes (100 TB): the fused pass is a single scan → one global
aggregate with map-side partials and no groupBy shuffle; `condition`
is applied pre-agg so parquet gets PushedFilters; only referenced
columns appear in expressions so ReadSchema prunes. The
detailed-error pass filters on the OR of failing tests and uses
`limit`, which Spark executes as an early-out CollectLimit.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_validator_spark.events import (
    QuickCheckError,
    ValidatorCounter,
    ValidatorError,
    ValidatorEvent,
    ValidatorGood,
    ValidatorTimer,
)
from data_validator_spark.sources import TableSource
from data_validator_spark.validators.base import (
    CheapCheck,
    Check,
    CostlyCheck,
    RowBasedCheck,
    calc_error_count_threshold,
)
from data_validator_spark.validators.colstats import ColStats


class ValidatorTableRunner:
    def __init__(
        self,
        source: TableSource,
        checks: list[Check],
        num_key_cols: int = 2,
        num_errors_to_report: int = 5,
        detailed_errors: bool = True,
    ):
        self.source = source
        self.checks = checks
        self.num_key_cols = num_key_cols
        self.num_errors_to_report = num_errors_to_report
        self.detailed_errors = detailed_errors
        self.events: list[ValidatorEvent] = []
        self.failed = False

    def add_event(self, ev: ValidatorEvent) -> None:
        self.events.append(ev)
        self.failed = self.failed or ev.failed

    # -- phase 1: config ----------------------------------------------------
    def config_check(self, spark: SparkSession) -> bool:
        timer = ValidatorTimer(f"configCheck for {self.source.label}")
        with timer:
            try:
                df = self.source.open(spark)
            except Exception as e:  # table missing / unreadable
                self.add_event(ValidatorError(f"Failed to open table '{self.source.label}': {e}"))
                return True
            error = self._check_key_cols(df)
            for c in self.checks:
                error = c.config_check(df) or error
        self.add_event(timer)
        if error:
            self.add_event(ValidatorError(f"ConfigCheck failed for {self.source.label}"))
        else:
            self.add_event(ValidatorGood(f"ConfigCheck for {self.source.label}"))
        return error

    def _check_key_cols(self, df: DataFrame) -> bool:
        err = False
        for c in self.source.key_columns or []:
            if c not in df.columns:
                self.add_event(ValidatorError(f"KeyColumn '{c}' is not a column in {self.source.label}"))
                err = True
        return err

    def key_select(self, df: DataFrame) -> list[str]:
        """Parity: ValidatorTable.createKeySelect — explicit keyColumns
        or the first numKeyCols columns."""
        return self.source.key_columns or list(df.columns[: self.num_key_cols])

    # -- phase 2+3: fused quick checks ---------------------------------------
    def quick_checks(self, spark: SparkSession) -> bool:
        df = self.source.open(spark)
        cheap = [c for c in self.checks if isinstance(c, CheapCheck)]
        if not cheap:
            return False

        aggs = [F.count(F.lit(1)).alias("dv_count")]
        for i, chk in enumerate(cheap):
            aggs.extend(chk.agg_exprs(df, f"qc{i}"))

        timer = ValidatorTimer(f"{self.source.label}: quickCheck timer")
        with timer:
            row = df.agg(*aggs).collect()[0].asDict()
        self.add_event(timer)

        count = int(row["dv_count"])
        self.add_event(ValidatorCounter(f"RowCount for {self.source.label}", count))

        failed = False
        for chk in cheap:
            failed = chk.evaluate(row, count) or failed

        # colstats histogram second pass — all colstats checks share ONE scan
        second = [c for c in cheap if isinstance(c, ColStats) and c.needs_second_pass()]
        if second:
            hist_aggs = [e for c in second for e in c.histogram_exprs()]
            t2 = ValidatorTimer(f"{self.source.label}: colstats second pass")
            with t2:
                hrow = df.agg(*hist_aggs).collect()[0].asDict()
            self.add_event(t2)
            for c in second:
                c.sink_histogram(hrow)

        if failed:
            bad = ", ".join(c.describe() for c in self.checks if c.failed)
            self.add_event(ValidatorError(f"QuickChecks on {self.source.label} failed for {bad}"))
            if self.detailed_errors:
                self._quick_error_details(df)
        return failed

    # -- phase 4: detailed errors --------------------------------------------
    def _quick_error_details(self, df: DataFrame) -> None:
        """ONE filtered pass for all failed row-based checks.

        Parity: ValidatorTable.quickErrorDetails
        (ValidatorTable.scala:154-178) — select keyColumns + every
        failed check's column, filter on the OR of the failed col-tests,
        single take(numErrorsToReport), then report each sampled row
        under each failed check. At 100 TB this is one early-out scan
        instead of one scan per failed check.
        """
        key_cols = self.key_select(df)
        failed_checks = [
            c
            for c in self.checks
            if c.failed and isinstance(c, RowBasedCheck) and c.column in df.columns
        ]
        if not failed_checks:
            return

        cond = failed_checks[0].col_test(df)
        for chk in failed_checks[1:]:
            cond = cond | chk.col_test(df)
        sel = key_cols + [c.column for c in failed_checks]

        timer = ValidatorTimer(f"quickErrorDetails for {self.source.label}")
        with timer:
            rows = df.select(*sel).where(cond).take(self.num_errors_to_report)
        self.add_event(timer)

        nk = len(key_cols)
        for r in rows:
            key = {k: r[i] for i, k in enumerate(key_cols)}
            for i, chk in enumerate(failed_checks):
                val = r[nk + i]
                chk.add_event(
                    QuickCheckError(key, val, f"{chk.check_type} failed! {chk.column} = {val}")
                )

    # -- phase 5: costly checks ----------------------------------------------
    def costly_checks(self, spark: SparkSession) -> bool:
        df = self.source.open(spark)
        failed = False
        for c in self.checks:
            if isinstance(c, CostlyCheck):
                failed = c.costly_check(df) or failed
        return failed

    # -- orchestration ---------------------------------------------------------
    def run(self, spark: SparkSession) -> bool:
        """Full lifecycle; returns True when validation FAILED."""
        if self.config_check(spark):
            return True
        failed = self.quick_checks(spark)
        failed = self.costly_checks(spark) or failed
        self.failed = self.failed or failed
        return failed

    def to_dict(self) -> dict[str, Any]:
        return {
            # source-specific identity keys first (reference tableEncoder
            # emits parquetFile/orcFile/db+table/format, not a label)
            **self.source.json_identity(),
            "table": self.source.label,  # additive: readable label
            "failed": self.failed or any(c.failed for c in self.checks),
            "keyColumns": self.source.key_columns,
            "condition": self.source.condition,
            "checks": [c.to_result().to_dict() for c in self.checks],
            "events": [e.to_dict() for e in self.events],
        }


def run_config(spark: SparkSession, config: "ValidatorConfig") -> dict[str, Any]:
    """Run every table in a parsed config; returns the report dict.

    Parity: reference Main.scala phase ordering — configCheck for ALL
    tables first, and a failure in ANY table is fatal (skips the data
    phases entirely, still emitting the report); then quickChecks for
    all tables before any costlyChecks.
    """
    from data_validator_spark import report as report_mod

    runners = config.build_runners()
    config_failed = False
    for r in runners:
        config_failed = r.config_check(spark) or config_failed

    failed = config_failed
    if not config_failed:
        for r in runners:
            r.failed = r.quick_checks(spark) or r.failed
            failed = r.failed or failed
        for r in runners:
            r.failed = r.costly_checks(spark) or r.failed
            failed = r.failed or failed
    return report_mod.build_report(config, runners, failed, spark)


from data_validator_spark.config import ValidatorConfig  # noqa: E402  (cycle: config builds runners)
