"""Unit tests for the pure validation functions — the reference's own
documented cases (main.py:362-403, main.py:240-249)."""

from __future__ import annotations

from datetime import datetime

from cs_pipeline_spark.plans.validate import (
    co2_bounds_filter,
    validate_date_range,
)


def _dt(s: str) -> datetime:
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


def test_daily_aligned_ok():
    assert (
        validate_date_range(
            _dt("2020-01-01 00:00:00"), _dt("2020-01-07 23:00:00"), "DAILY"
        )
        == []
    )


def test_daily_misaligned():
    v = validate_date_range(
        _dt("2020-01-01 06:00:00"), _dt("2020-01-07 22:00:00"), "DAILY"
    )
    assert v == ["daily_start_not_midnight", "daily_end_not_2300"]


def test_monthly_aligned_ok():
    # February of a leap year — last_day must be the 29th
    assert (
        validate_date_range(
            _dt("2020-02-01 00:00:00"), _dt("2020-02-29 23:00:00"), "MONTHLY"
        )
        == []
    )


def test_monthly_misaligned():
    v = validate_date_range(
        _dt("2020-02-02 00:00:00"), _dt("2020-02-28 23:00:00"), "MONTHLY"
    )
    assert v == [
        "monthly_start_not_month_start",
        "monthly_end_not_month_end",
    ]


def test_end_before_start():
    v = validate_date_range(
        _dt("2020-01-02 00:00:00"), _dt("2020-01-01 00:00:00"), None
    )
    assert v == ["end_not_after_start"]


def test_none_aggregation_passes():
    for agg in (None, "", "NONE"):
        assert (
            validate_date_range(
                _dt("2020-01-01 03:00:00"), _dt("2020-01-02 04:30:00"), agg
            )
            == []
        )


def test_unknown_aggregation():
    v = validate_date_range(
        _dt("2020-01-01 00:00:00"), _dt("2020-01-02 00:00:00"), "WEEKLY"
    )
    assert v == ["unknown_aggregation_type"]


def test_co2_in_bounds_kept():
    preds, dropped = co2_bounds_filter(
        _dt("2002-01-01 00:00:00"), _dt("2023-12-31 23:00:00"), ["TA", "CO2"]
    )
    assert preds == ["TA", "CO2"] and not dropped


def test_co2_out_of_bounds_dropped():
    preds, dropped = co2_bounds_filter(
        _dt("2001-12-31 00:00:00"), _dt("2010-01-01 00:00:00"), ["TA", "CO2"]
    )
    assert preds == ["TA"] and dropped
    preds, dropped = co2_bounds_filter(
        _dt("2020-01-01 00:00:00"), _dt("2024-01-01 00:00:00"), ["CO2"]
    )
    assert preds == [] and dropped


def test_co2_absent_untouched():
    preds, dropped = co2_bounds_filter(
        _dt("1990-01-01 00:00:00"), _dt("2030-01-01 00:00:00"), ["TA"]
    )
    assert preds == ["TA"] and not dropped
