"""Shared fixtures. Session-scoped SparkSession on local[4]
(SURVEY §5), UTC, small shuffle partitions for speed."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession  # noqa: E402

from data_validator_spark.sources import TableSource  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("data-validator-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


class DFSource(TableSource):
    """In-memory source for runner tests (no files needed)."""

    def __init__(self, df, **kw):
        super().__init__(**kw)
        self._df = df

    def load_df(self, spark):
        return self._df

    @property
    def label(self) -> str:
        return "test_df"
