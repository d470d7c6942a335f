"""Date-spec planner unit tests (driver-side, no Spark needed)."""

from __future__ import annotations

from datetime import date

import pytest

from funnel_report_etl_pipeline__spark.sources.datespec import DateWindow, parse_date_spec


def test_single_day():
    w = parse_date_spec("15_02_2026")
    assert w == DateWindow(date(2026, 2, 15), date(2026, 2, 15))
    assert w.days() == [date(2026, 2, 15)]


def test_range_inclusive():
    w = parse_date_spec("28_02_2026 -> 02_03_2026")
    assert w.days() == [
        date(2026, 2, 28),
        date(2026, 3, 1),
        date(2026, 3, 2),
    ]


def test_month_glob():
    w = parse_date_spec("*02_2026")
    assert w.start == date(2026, 2, 1)
    assert w.end == date(2026, 2, 28)


def test_month_glob_leap():
    w = parse_date_spec("*02_2024")
    assert w.end == date(2024, 2, 29)


def test_default_is_yesterday():
    w = parse_date_spec("", today=date(2026, 3, 1))
    assert w.start == w.end == date(2026, 2, 28)


def test_month_prefixes_cross_year():
    w = parse_date_spec("15_11_2025 -> 10_01_2026")
    assert w.month_prefixes() == ["11_2025", "12_2025", "01_2026"]


def test_degenerate_range_equals_single_day():
    assert parse_date_spec("05_06_2026 -> 05_06_2026") == parse_date_spec("05_06_2026")


def test_reversed_range_raises():
    with pytest.raises(ValueError):
        parse_date_spec("02_03_2026 -> 28_02_2026")
