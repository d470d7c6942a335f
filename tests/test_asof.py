"""As-of join edge semantics: <= match, no-match NULL, tolerance, ties."""

from __future__ import annotations

from datetime import datetime

import pytest

from funnel_report_etl_pipeline__spark.operators.asof import asof_join


def ts(minute):
    return datetime(2026, 1, 1, 10, minute, 0)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, ts(10), "a"), (1, ts(20), "b"), (2, ts(5), "c"), (3, ts(30), "d")],
        "k int, ts timestamp, lbl string",
    )
    right = spark.createDataFrame(
        [(1, ts(10), 100.0), (1, ts(15), 150.0), (2, ts(6), 60.0)],
        "k int, ts timestamp, px double",
    )
    return left, right


def test_basic_backward_match(spark, frames):
    left, right = frames
    out = {(r.k, r.lbl): r for r in asof_join(left, right, on=["k"]).collect()}
    # exact-equal timestamp matches (<= semantics)
    assert out[(1, "a")].asof_px == 100.0
    # latest of several earlier rows
    assert out[(1, "b")].asof_px == 150.0
    # right row is LATER than left → no match
    assert out[(2, "c")].asof_px is None
    # key with no right rows at all → no match
    assert out[(3, "d")].asof_px is None


def test_tolerance(spark, frames):
    left, right = frames
    out = {
        (r.k, r.lbl): r
        for r in asof_join(left, right, on=["k"], tolerance_seconds=60).collect()
    }
    # (1,"b") at 10:20, last view 10:15 → 300s stale > 60s tolerance
    assert out[(1, "b")].asof_px is None
    assert out[(1, "a")].asof_px == 100.0  # 0s stale


def test_tie_among_right_rows(spark):
    left = spark.createDataFrame([(1, ts(10), "x")], "k int, ts timestamp, lbl string")
    right = spark.createDataFrame(
        [(1, ts(5), 1.0), (1, ts(5), 9.0)], "k int, ts timestamp, px double"
    )
    r = asof_join(left, right, on=["k"], right_tiebreak="px").collect()[0]
    assert r.asof_px == 9.0  # highest tiebreak wins deterministically


def test_forward_direction(spark, frames):
    left, right = frames
    out = {
        (r.k, r.lbl): r
        for r in asof_join(left, right, on=["k"], direction="forward").collect()
    }
    # (1,"a") at 10:10: a right row AT 10:10 matches >= (same-ts inclusive)
    assert out[(1, "a")].asof_px == 100.0
    # (1,"b") at 10:20: no right row at-or-after -> no match
    assert out[(1, "b")].asof_px is None
    # (2,"c") at 10:05: right at 10:06 is the next one
    assert out[(2, "c")].asof_px == 60.0
    assert out[(3, "d")].asof_px is None


def test_forward_tolerance_and_tiebreak(spark):
    left = spark.createDataFrame([(1, ts(0), "x")], "k int, ts timestamp, lbl string")
    right = spark.createDataFrame(
        [(1, ts(5), 1.0), (1, ts(5), 9.0), (1, ts(50), 3.0)],
        "k int, ts timestamp, px double",
    )
    # lowest tiebreak wins forward (mirrors highest-wins backward)
    r = asof_join(
        left, right, on=["k"], right_tiebreak="px", direction="forward"
    ).collect()[0]
    assert r.asof_px == 1.0
    # tolerance measures FORWARD gap: 5 min > 60 s -> stale
    r2 = asof_join(
        left, right, on=["k"], tolerance_seconds=60, direction="forward"
    ).collect()[0]
    assert r2.asof_px is None


def test_direction_validation():
    with pytest.raises(ValueError):
        asof_join(None, None, on=["k"], direction="sideways")


def test_nearest_direction(spark, frames):
    left, right = frames
    out = {
        (r.k, r.lbl): r
        for r in asof_join(left, right, on=["k"], direction="nearest").collect()
    }
    # (1,"a") at 10:10: backward hit at 10:10 (gap 0) beats forward 10:15
    assert out[(1, "a")].asof_px == 100.0
    # (1,"b") at 10:20: only backward exists (10:15)
    assert out[(1, "b")].asof_px == 150.0
    # (2,"c") at 10:05: only forward exists (10:06)
    assert out[(2, "c")].asof_px == 60.0
    assert out[(3, "d")].asof_px is None


def test_nearest_prefers_smaller_gap_and_ties_backward(spark):
    left = spark.createDataFrame(
        [(1, ts(10), "x"), (1, ts(12), "y")], "k int, ts timestamp, lbl string"
    )
    right = spark.createDataFrame(
        [(1, ts(9), 1.0), (1, ts(14), 2.0), (1, ts(15), 9.0)],
        "k int, ts timestamp, px double",
    )
    out = {r.lbl: r for r in
           asof_join(left, right, on=["k"], direction="nearest").collect()}
    # "x" at 10:10: backward 10:09 (1 min) beats forward 10:14 (4 min)
    assert out["x"].asof_px == 1.0
    # "y" at 10:12: forward 10:14 (2 min) beats backward 10:09 (3 min)
    assert out["y"].asof_px == 2.0
    # equidistant tie goes backward (pandas semantics)
    left2 = spark.createDataFrame([(1, ts(10), "t")], "k int, ts timestamp, lbl string")
    right2 = spark.createDataFrame(
        [(1, ts(8), 1.0), (1, ts(12), 2.0)], "k int, ts timestamp, px double"
    )
    r = asof_join(left2, right2, on=["k"], direction="nearest").collect()[0]
    assert r.asof_px == 1.0
    # nearest + tolerance: both sides filtered before the choice
    r2 = asof_join(
        left2, right2, on=["k"], direction="nearest", tolerance_seconds=60
    ).collect()[0]
    assert r2.asof_px is None
