"""uniqueCheck: count of key-tuples appearing more than once.

Parity: reference UniqueCheck.scala costlyCheck —
df.select(cols).groupBy(cols).count().where("count > 1").count().

Scale: the groupBy shuffles on the key columns; partial (map-side)
counting collapses duplicates before the shuffle, and AQE coalesces
or splits skewed partitions at runtime. This is the natural Spark
plan for distinct-key cardinality and survives 100× scale-up.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_validator_spark.events import ValidatorError, ValidatorGood, ValidatorTimer
from data_validator_spark.validators.base import CostlyCheck


class UniqueCheck(CostlyCheck):
    check_type = "uniqueCheck"

    def __init__(self, columns: Sequence[str]):
        super().__init__()
        self.columns = list(columns)

    def config_check(self, df: DataFrame) -> bool:
        for c in self.columns:
            self.column_in_df(df, c)
        return self.failed

    def costly_check(self, df: DataFrame) -> bool:
        timer = ValidatorTimer(f"UniqueCheck({self.columns})")
        with timer:
            dup_keys = (
                df.select(*self.columns)
                .groupBy(*self.columns)
                .count()
                .where(F.col("count") > 1)
                .count()
            )
        self.add_event(timer)
        if dup_keys > 0:
            self.add_event(ValidatorError(f"{dup_keys} duplicates found!"))
        else:
            self.add_event(ValidatorGood("no duplicates found."))
        return self.failed

    def report_fields(self) -> dict:
        return {"columns": self.columns}
