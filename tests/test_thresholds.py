"""Threshold grammar + arithmetic. Mirrors reference RowBasedSpec
threshold cases (RowBased.scala:56, THRESHOLD_NUMBER_REGEX)."""

import pytest

from data_validator_spark.validators.base import (
    calc_error_count_threshold,
    parse_threshold,
)


def test_absolute_threshold():
    assert calc_error_count_threshold("100", 1000) == 100


def test_fractional_threshold():
    assert calc_error_count_threshold("0.25", 1000) == 250


def test_percent_threshold():
    assert calc_error_count_threshold("33%", 1000) == 330


def test_percent_threshold_rounds_down():
    assert calc_error_count_threshold("10%", 55) == 5


def test_none_threshold_means_zero_tolerance():
    assert calc_error_count_threshold(None, 1000) == 0


def test_fraction_exactly_one_is_absolute():
    assert calc_error_count_threshold("1.0", 1000) == 1


@pytest.mark.parametrize("bad", ["abc", "-5", "12%%", "%", ""])
def test_unparsable_threshold_raises(bad):
    with pytest.raises(ValueError):
        parse_threshold(bad)


@pytest.mark.parametrize("good,num", [("100", 100.0), ("0.25", 0.25), ("33%", 33.0), ("33 %", 33.0)])
def test_parsable_thresholds(good, num):
    assert parse_threshold(good) == num
