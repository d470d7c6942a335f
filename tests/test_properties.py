"""Property-based tests (hypothesis) for the cross-engine parity helpers —
the pieces where a silent divergence class would poison every oracle."""

from __future__ import annotations

from datetime import date, timedelta

from hypothesis import given, settings, strategies as st

from funnel_report_etl_pipeline__spark.functions.core import pct_py
from funnel_report_etl_pipeline__spark.sources.datespec import DateWindow, parse_date_spec


@given(st.integers(-10**6, 10**6), st.integers(0, 10**6))
def test_pct_py_matches_reference_pct(v, t):
    """pct_py ≡ the reference's _pct for all int inputs (zero-guard incl.)."""
    expected = round(v / t * 100, 1) if t > 0 else 0
    assert pct_py(v, t) == expected


@given(st.integers(0, 3650), st.integers(0, 60))
@settings(max_examples=50)
def test_datewindow_days_roundtrip(start_off, length):
    start = date(2020, 1, 1) + timedelta(days=start_off)
    end = start + timedelta(days=length)
    days = DateWindow(start, end).days()
    assert len(days) == length + 1
    assert days[0] == start and days[-1] == end
    assert all((b - a).days == 1 for a, b in zip(days, days[1:]))


@given(st.integers(0, 3650))
@settings(max_examples=50)
def test_single_day_spec_roundtrip(off):
    d = date(2020, 1, 1) + timedelta(days=off)
    spec = d.strftime("%d_%m_%Y")
    w = parse_date_spec(spec)
    assert w.start == w.end == d


@given(st.integers(0, 3650), st.integers(0, 90))
@settings(max_examples=50)
def test_month_prefixes_cover_every_day(start_off, length):
    start = date(2020, 1, 1) + timedelta(days=start_off)
    w = DateWindow(start, start + timedelta(days=length))
    prefixes = set(w.month_prefixes())
    for d in w.days():
        assert d.strftime("%m_%Y") in prefixes
