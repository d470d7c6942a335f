"""Round-9 batch: planted-fixture behavior tests for the sketch-
percentile twins (oracle parity is covered by driver_sim / CORRECTNESS;
these pin the semantics on inputs where the right answer is computable
by hand)."""

from __future__ import annotations

from datetime import datetime

import pytest

from funnel_report_etl_pipeline__spark.plans.registry import load_all


@pytest.fixture(scope="module")
def specs():
    return load_all()


def _write_sf(spark, tmp_path_factory, name: str, frames: dict):
    d = tmp_path_factory.mktemp(name)
    for t, df in frames.items():
        df.coalesce(1).write.mode("overwrite").parquet(str(d / f"{t}.parquet"))
    return str(d)


def _orders(spark, rows):
    return spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )


def _cust(spark, rows):
    return spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )


def test_equidepth_approx_balanced_buckets(spark, specs, tmp_path_factory):
    d = datetime(2024, 1, 1)
    # prices 1..16: discrete octile boundaries are the values at rank
    # ceil(16q) = 2,4,6,8,10,12,14 — 8 buckets of exactly 2, same tiling
    # as the exact twin on this fixture (interpolated and discrete
    # boundaries bin identically when ranks land between integers)
    orders = _orders(spark, [(i, 1, "O", float(i), d, "P") for i in range(1, 17)])
    sf = _write_sf(spark, tmp_path_factory, "eqda", {"orders": orders})
    out = specs["equidepth_price_histogram_approx"].fn(spark, sf).collect()
    assert [r["bucket"] for r in out] == list(range(8))
    assert all(r["n_orders"] == 2 for r in out)
    assert out[0]["lo"] == 1.0 and out[7]["hi"] == 16.0
    for a, b in zip(out, out[1:]):
        assert a["hi"] < b["lo"]


def test_equidepth_approx_discrete_boundary_is_data_value(spark, specs, tmp_path_factory):
    d = datetime(2024, 1, 1)
    # 5 skewed prices: discrete boundaries are ACTUAL data values, so
    # every bucket's [lo, hi] is a sub-range of observed prices and the
    # whale lands alone in the top bucket
    prices = [10.0, 11.0, 12.0, 13.0, 9000.0]
    orders = _orders(spark, [(i, 1, "O", p, d, "P") for i, p in enumerate(prices, 1)])
    sf = _write_sf(spark, tmp_path_factory, "eqdb", {"orders": orders})
    out = specs["equidepth_price_histogram_approx"].fn(spark, sf).collect()
    assert sum(r["n_orders"] for r in out) == 5
    top = out[-1]
    assert top["lo"] == top["hi"] == 9000.0 and top["n_orders"] == 1


def test_winsorized_approx_clips_the_whale_to_observed_value(
    spark, specs, tmp_path_factory
):
    d = datetime(2024, 1, 1)
    cust = _cust(spark, [(1, "c1", 1, 0.0, "S1")])
    # 19×10 + one 1000: discrete p95 = value at rank ceil(20·0.95) = 19
    # → 10, so the whale clamps all the way to 10 (an OBSERVED price —
    # the exact twin would interpolate 10 + 0.05·19·(1000−10) instead)
    orders = _orders(
        spark,
        [(i, 1, "O", 10.0, d, "P") for i in range(1, 20)]
        + [(20, 1, "O", 1000.0, d, "P")],
    )
    sf = _write_sf(spark, tmp_path_factory, "wina", {"orders": orders, "customer": cust})
    out = specs["winsorized_revenue_mean_approx"].fn(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_orders"] == 20
    assert r["raw_mean"] == pytest.approx(59.5)
    assert r["winsorized_mean"] == pytest.approx(10.0)


def test_approx_twins_match_exact_twins_at_gate_scale(spark, specs):
    """At testdata scale the sketch never compresses, so the approx
    histogram's bucket totals and the approx winsorized mean must sit
    right next to their exact twins (discrete-vs-interpolated boundaries
    move individual boundary ties only)."""
    from .conftest import SF_SMALL

    ex = specs["equidepth_price_histogram"].fn(spark, SF_SMALL).collect()
    ap = specs["equidepth_price_histogram_approx"].fn(spark, SF_SMALL).collect()
    assert [r["bucket"] for r in ap] == [r["bucket"] for r in ex]
    assert sum(r["n_orders"] for r in ap) == sum(r["n_orders"] for r in ex)
    # equi-depth: every approx bucket within 2% of the ideal eighth
    n = sum(r["n_orders"] for r in ap)
    for r in ap:
        assert abs(r["n_orders"] - n / 8) <= max(2, 0.02 * n)

    exw = {r["segment"]: r for r in specs["winsorized_revenue_mean"].fn(spark, SF_SMALL).collect()}
    apw = {r["segment"]: r for r in specs["winsorized_revenue_mean_approx"].fn(spark, SF_SMALL).collect()}
    assert set(exw) == set(apw)
    for seg, r in apw.items():
        assert r["n_orders"] == exw[seg]["n_orders"]
        assert r["raw_mean"] == pytest.approx(exw[seg]["raw_mean"])
        # clamp bounds differ by at most one order's interpolation gap
        assert r["winsorized_mean"] == pytest.approx(
            exw[seg]["winsorized_mean"], rel=0.02
        )


def test_sketch_regime_guard_fails_loud_and_conf_disables(spark):
    """The shared guard must (a) fail the JOB with its explicit message
    when the value count exceeds the sketch accuracy, and (b) become a
    no-op NULL under spark.funnelreport.sketchExactRegimeGuard=false —
    the conf production / scale probes set to run the *_approx queries
    in their intended approximate regime."""
    from funnel_report_etl_pipeline__spark.functions.core import (
        SKETCH_GUARD_CONF,
        sketch_regime_guard,
    )
    from pyspark.sql import functions as F

    df = spark.range(1).select(F.lit(5).alias("__n"))
    guard = sketch_regime_guard(spark, "unit_probe", "__n", 3)
    probe = df.select(F.when(guard.isNull(), F.lit(1)).alias("v"))
    with pytest.raises(Exception, match="unit_probe.*exceeds"):
        probe.collect()
    # accuracy regime holds -> NULL guard, value passes through
    ok = sketch_regime_guard(spark, "unit_probe", "__n", 10)
    assert df.select(F.when(ok.isNull(), F.lit(1)).alias("v")).collect()[0].v == 1
    # conf off -> guard is a plain NULL literal even past the regime
    spark.conf.set(SKETCH_GUARD_CONF, "false")
    try:
        off = sketch_regime_guard(spark, "unit_probe", "__n", 3)
        assert df.select(F.when(off.isNull(), F.lit(1)).alias("v")).collect()[0].v == 1
    finally:
        spark.conf.unset(SKETCH_GUARD_CONF)


def test_session_bounce_approx_matches_exact_at_gate_scale(spark, specs):
    """Sketch never compresses at testdata scale: session counts and
    bounce stats are identical to the exact twin; dwell percentiles are
    discrete (observed durations) vs interpolated — within one
    inter-session gap of each other."""
    from .conftest import SF_SMALL

    ex = {r["day"]: r for r in specs["session_bounce_stats"].fn(spark, SF_SMALL).collect()}
    ap = {r["day"]: r for r in specs["session_bounce_stats_approx"].fn(spark, SF_SMALL).collect()}
    assert set(ex) == set(ap)
    for day, r in ap.items():
        assert r["n_sessions"] == ex[day]["n_sessions"]
        assert r["n_bounce"] == ex[day]["n_bounce"]
        assert r["bounce_rate"] == pytest.approx(ex[day]["bounce_rate"])
        # discrete quantile is an element adjacent to the interpolation
        assert r["p50_duration_s"] == pytest.approx(
            ex[day]["p50_duration_s"], rel=0.25, abs=60.0
        )


def test_release_all_caches_clears_blocks_and_slots(spark):
    """The shared harness-hygiene helper (ADVICE round-8): one call must
    drop cached/persisted blocks AND the dedup single-slot frames, and it
    must never raise (failure isolation — a broken query's JVM state must
    not abort the harness run holding the collected timings)."""
    from pyspark.sql import functions as F

    from funnel_report_etl_pipeline__spark.operators import dedup as _dedup
    from funnel_report_etl_pipeline__spark.session import release_all_caches

    df = spark.range(100).select(F.col("id"))
    df.persist().count()
    _dedup._PERSISTED_GRAMS.append((("x", 1), df))
    _dedup._PERSISTED_PAIRS.append((("y", 2), df))
    release_all_caches(spark)
    assert not _dedup._PERSISTED_GRAMS and not _dedup._PERSISTED_PAIRS
    rdds = spark._jsparkSession.sparkContext().getPersistentRDDs()
    assert rdds.size() == 0
    # idempotent + safe on an already-clean session
    release_all_caches(spark)
