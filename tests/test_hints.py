"""Size-gated broadcast helper: both sides of the threshold, plus the
conf override (round-7 verdict ask #3 — a hard hint obeys unconditionally,
so every deployment-scale-dependent hint must degrade to AQE's choice past
the gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from funnel_report_etl_pipeline__spark.functions.hints import (
    DEFAULT_GATE_BYTES,
    estimated_size_bytes,
    maybe_broadcast,
)

from .conftest import SF_SMALL


def _has_broadcast_hint(df) -> bool:
    plan = df._jdf.queryExecution().logical().toString()
    return "Hint" in plan and "broadcast" in plan.lower()


def _has_merge_hint(df) -> bool:
    plan = df._jdf.queryExecution().logical().toString()
    return "Hint" in plan and "merge" in plan.lower()


def test_estimate_is_positive_and_plan_side(spark):
    nation = spark.read.parquet(f"{SF_SMALL}/nation.parquet")
    est = estimated_size_bytes(nation)
    assert est is not None and 0 < est < DEFAULT_GATE_BYTES


def test_hints_below_gate(spark):
    nation = spark.read.parquet(f"{SF_SMALL}/nation.parquet")
    assert _has_broadcast_hint(maybe_broadcast(nation))
    assert _has_broadcast_hint(maybe_broadcast(nation, gate_bytes=10**9))


def test_no_hint_above_gate(spark):
    nation = spark.read.parquet(f"{SF_SMALL}/nation.parquet")
    out = maybe_broadcast(nation, gate_bytes=1)
    assert not _has_broadcast_hint(out)
    # past the gate the frame is pinned to sort-merge (round-9 dim-growth
    # probe: a bare frame lets the planner's optimistic pruned estimates
    # broadcast a 40M-row dim and OOM; merge rather than shuffle_hash
    # because the SMJ sorter spills where a hash build cannot)
    assert _has_merge_hint(out)
    assert out.schema == nation.schema


def test_gate_reads_session_conf(spark):
    nation = spark.read.parquet(f"{SF_SMALL}/nation.parquet")
    key = "spark.funnel.broadcastGateBytes"
    try:
        spark.conf.set(key, "1")
        assert not _has_broadcast_hint(maybe_broadcast(nation))
        assert _has_merge_hint(maybe_broadcast(nation))
        spark.conf.set(key, str(10**9))
        assert _has_broadcast_hint(maybe_broadcast(nation))
    finally:
        spark.conf.unset(key)


def test_filtered_dimension_estimate_shrinks(spark):
    part = spark.read.parquet(f"{SF_SMALL}/part.parquet")
    full = estimated_size_bytes(part)
    filtered = estimated_size_bytes(part.filter(F.col("p_brand") == "Brand#13"))
    assert full is not None and filtered is not None
    # Catalyst applies a selectivity estimate below the filter
    assert filtered <= full


def test_values_unchanged_either_side_of_gate(spark):
    """The helper is plan-only: hinted and unhinted joins return identical
    rows."""
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    cust = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    base = lambda c: (
        orders.join(c, orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n"))
    )
    a = {(r.c_nationkey, r.n) for r in base(maybe_broadcast(cust)).collect()}
    b = {(r.c_nationkey, r.n) for r in base(maybe_broadcast(cust, gate_bytes=1)).collect()}
    assert a == b and a


def test_degrade_path_pins_sort_merge_join_in_real_query(spark):
    """The dim-growth probe's finding, pinned at test scale: force every
    maybe_broadcast gate shut via the session conf and the winsorized
    query must plan its customer join as a SortMergeJoin — NO broadcast
    join may carry the custkey (the planner's own pruned estimates would
    otherwise broadcast a corpus-scale dim and OOM, the round-9 probe
    failure), and no ShuffledHashJoin either (its build-side hash map
    cannot spill — round-9 advice) — while values stay identical to the
    broadcast-era plan."""
    from funnel_report_etl_pipeline__spark.plans.registry import load_all

    fn = load_all()["winsorized_revenue_mean"].fn
    base = {tuple(r) for r in fn(spark, SF_SMALL).collect()}
    key = "spark.funnel.broadcastGateBytes"
    try:
        spark.conf.set(key, "1")
        df = fn(spark, SF_SMALL)
        phys = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in phys
        assert not any(
            "custkey" in ln
            for ln in phys.splitlines()
            if "BroadcastHashJoin" in ln or "ShuffledHashJoin" in ln
        )
        assert {tuple(r) for r in df.collect()} == base
    finally:
        spark.conf.unset(key)


def test_untrustworthy_estimate_returns_bare_frame(spark):
    """A Join/Aggregate output's size estimate is multiplied garbage —
    past the gate the helper must return such frames BARE (AQE decides
    from accurate runtime stats) instead of pinning a shuffle on what is
    actually a tiny frame (round-9: customer⋈nation estimated 2.87 GB
    for 150 rows)."""
    cust = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    nation = spark.read.parquet(f"{SF_SMALL}/nation.parquet")
    joined = cust.join(nation, cust.c_nationkey == nation.n_nationkey)
    out = maybe_broadcast(joined, gate_bytes=1)
    assert not _has_broadcast_hint(out)
    assert not _has_merge_hint(out)
    # under the gate a derived frame still gets the broadcast pin
    assert _has_broadcast_hint(maybe_broadcast(joined, gate_bytes=1 << 60))
