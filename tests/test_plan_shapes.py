"""Physical-plan regression tests: the PLANS.md claims, executable.

These lock in the plan shapes that matter at 100 TB — if a refactor
reintroduces a shuffle, loses pushdown, or drops a group-limit, these fail
even though results stay correct.
"""

from __future__ import annotations

import pytest

from funnel_report_etl_pipeline__spark.plans.registry import load_all

from .conftest import SF_SMALL

SPECS = load_all()


def plan_of(spark, name: str) -> str:
    return SPECS[name].fn(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()


def test_scan_filter_pushdown(spark):
    p = plan_of(spark, "scan_filter_eq")
    assert "PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)]" in p
    # column pruning: the untouched payload column never leaves the scan
    assert "ts" not in p.split("ReadSchema")[1].splitlines()[0]


def test_pricing_summary_partial_final_agg(spark):
    p = plan_of(spark, "pricing_summary")
    assert "partial_sum" in p  # map-side combine
    assert p.count("Exchange hashpartitioning") == 1  # one shuffle only


def test_topk_uses_take_ordered(spark):
    p = plan_of(spark, "topk_orders")
    assert "TakeOrderedAndProject" in p
    assert "Exchange" not in p  # no shuffle for global top-k


def test_window_rank_group_limit_below_shuffle(spark):
    p = plan_of(spark, "window_rank")
    assert p.count("WindowGroupLimit") == 2  # partial (map-side) + final


def test_broadcast_dims_never_shuffle_fact(spark):
    p = plan_of(spark, "join_broadcast_dims")
    assert p.count("BroadcastHashJoin") == 2
    assert "Exchange hashpartitioning(c_nationkey" not in p
    assert "Exchange hashpartitioning(n_regionkey" not in p


def test_event_funnel_single_fact_shuffle(spark):
    p = plan_of(spark, "event_funnel_users")
    # one user_id exchange for the fold; the only other is the 1-row final
    assert p.count("Exchange hashpartitioning(user_id") == 1


PYTHON_PATH_EXCEPTIONS = {
    # the documented Arrow escape hatches — everything else must stay JVM-side
    "multimodal_meta",
    "multimodal_features",
    "arrow_udf_normalize",
    "grouped_arrow_stats",  # applyInPandas grouped map (FlatMapGroupsInPandas)
}


def test_no_python_udfs_in_any_relational_plan(spark):
    """No Python evaluation nodes anywhere in the registered batch queries
    (the Arrow-batched mapInPandas/pandas_udf queries are the documented
    exceptions — and even those must be Arrow, not row-at-a-time)."""
    for name in SPECS:
        p = plan_of(spark, name)
        if name in PYTHON_PATH_EXCEPTIONS:
            assert "BatchEvalPython" not in p, f"{name}: row-at-a-time Python UDF"
            continue
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, name


def test_hash_sample_prunes_and_never_shuffles(spark):
    p = plan_of(spark, "hash_sample")
    assert "Exchange" not in p  # pure map-side filter
    read = p.split("ReadSchema")[1].splitlines()[0]
    assert "doc_id" in read and "n_chars" in read and "text" not in read


def test_pack_sequences_single_shard_shuffle(spark):
    p = plan_of(spark, "pack_sequences")
    assert p.count("Exchange hashpartitioning") == 1  # the shard window only


def test_range_join_broadcasts_band_dim(spark):
    p = plan_of(spark, "range_join_pricebands")
    assert "BroadcastNestedLoopJoin" in p  # non-equi join, tiny side broadcast
    assert "Exchange hashpartitioning(p_retailprice" not in p


def test_grouped_collect_one_shuffle(spark):
    p = plan_of(spark, "grouped_collect")
    assert p.count("Exchange hashpartitioning") == 1  # single agg shuffle


def test_balanced_sample_broadcasts_rates_corpus_never_shuffles(spark):
    p = plan_of(spark, "balanced_source_sample")
    # the per-source rate table (tiny) is broadcast to the corpus scan side
    assert "BroadcastHashJoin" in p
    # corpus side reads only the two output columns
    read = p.split("ReadSchema")[1].splitlines()[0]
    assert "doc_id" in read and "source" in read and "text" not in read


def test_length_buckets_single_agg_shuffle(spark):
    p = plan_of(spark, "length_buckets")
    assert p.count("Exchange hashpartitioning") == 1  # partial/final agg only
    read = p.split("ReadSchema")[1].splitlines()[0]
    assert "text" in read and "doc_id" not in read  # only the tokenized column


def test_bigram_lm_no_window_no_python(spark):
    """The LM-support pipeline is groupBys + joins only — no windows (a
    window over the corpus would serialize per-partition) and no Python."""
    p = plan_of(spark, "bigram_lm_support")
    assert "Window" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
