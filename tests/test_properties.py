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


# ---------------------------------------------------------------------------
# Round-8 close batch: the mathematical rewrites behind the new queries.
# Spark-side behavior is pinned by planted fixtures + the oracle gate;
# these verify the REWRITES themselves hold over the whole input space.
# ---------------------------------------------------------------------------


@given(st.lists(st.integers(1, 10**6), min_size=1, max_size=20))
@settings(max_examples=200)
def test_gini_sum_of_squares_rewrite(counts):
    """gini_impurity_segments' integer form 1 − (Σn²)/N² equals the
    textbook 1 − Σp² for every count vector, and respects the
    [0, 1 − 1/k] bounds."""
    n = sum(counts)
    integer_form = 1.0 - sum(c * c for c in counts) / (float(n) * float(n))
    textbook = 1.0 - sum((c / n) ** 2 for c in counts)
    assert abs(integer_form - textbook) < 1e-9
    assert -1e-9 <= integer_form <= 1.0 - 1.0 / len(counts) + 1e-9


@given(
    st.lists(
        st.tuples(st.integers(0, 1000), st.integers(0, 1000)),
        min_size=2, max_size=6,
    ).filter(lambda rows: sum(a + b for a, b in rows) > 0
             and sum(a for a, _ in rows) > 0 and sum(b for _, b in rows) > 0
             and all(a + b > 0 for a, b in rows))
)
@settings(max_examples=200)
def test_chi_square_per_cell_terms_sum_to_statistic(rows):
    """chi_square_flag_status returns per-cell terms; their sum must be
    the classic χ² statistic Σ (O−E)²/E over the same table."""
    grand = sum(a + b for a, b in rows)
    col_a = sum(a for a, _ in rows)
    col_b = sum(b for _, b in rows)
    terms = []
    for a, b in rows:
        row_t = a + b
        for obs, col_t in ((a, col_a), (b, col_b)):
            e = row_t * col_t / grand
            if e > 0:
                terms.append((obs - e) ** 2 / e)
    # independence ⇒ statistic 0; any deviation ⇒ positive
    assert sum(terms) >= -1e-9
    # uniform table is exactly independent
    if len({r for r in rows}) == 1 and col_a == col_b:
        assert abs(sum(terms)) < 1e-9


@given(
    st.lists(
        st.tuples(st.floats(0, 100, allow_nan=False),
                  st.floats(-100, 100, allow_nan=False)),
        min_size=3, max_size=30,
    )
)
@settings(max_examples=200)
def test_ols_moment_form_matches_definition(points):
    """ols_brand_price_quantity's moment formula (n·Σxy − Σx·Σy)/(n·Σxx − (Σx)²)
    equals the least-squares definition slope = cov(x,y)/var(x) whenever
    x varies."""
    xs = [round(x) for x, _ in points]  # whole-number x, like l_quantity
    ys = [y for _, y in points]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    denom = n * sxx - sx * sx
    if denom == 0:  # constant x: slope undefined; the query's brands never are
        return
    slope = (n * sxy - sx * sy) / denom
    mx, my = sx / n, sy / n
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    var = sum((x - mx) ** 2 for x in xs)
    assert abs(slope - cov / var) < 1e-6 * max(1.0, abs(slope))


@given(st.lists(st.floats(0.1, 1000, allow_nan=False), min_size=7, max_size=7))
@settings(max_examples=200)
def test_ewma_kernel_is_convex_combination(window):
    """ewma_revenue_anomaly's unrolled kernel is a true weighted average:
    the result always lies within [min, max] of the trailing window."""
    w = [0.5, 0.25, 0.125, 0.0625, 0.03125, 0.015625, 0.015625]
    ewma = sum(wi * xi for wi, xi in zip(w, window))
    assert min(window) - 1e-9 <= ewma <= max(window) + 1e-9


@given(st.lists(st.integers(0, 6), min_size=1, max_size=50))
@settings(max_examples=200)
def test_islands_count_equals_changes_plus_one(priorities):
    """priority_change_intervals' running-sum island id: the number of
    islands is exactly 1 + (number of adjacent changes), and island ids
    are contiguous from 1."""
    changes = sum(1 for a, b in zip(priorities, priorities[1:]) if a != b)
    # replicate the query's lag/running-sum logic
    islands = []
    prev = None
    island = 0
    for p in priorities:
        if prev is None or p != prev:
            island += 1
        islands.append(island)
        prev = p
    assert islands[-1] == changes + 1
    assert islands[0] == 1
    assert all(b - a in (0, 1) for a, b in zip(islands, islands[1:]))
