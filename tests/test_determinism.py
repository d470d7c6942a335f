"""Results must be independent of physical strategy and parallelism —
the property that makes local verification meaningful for a 1000-executor
deployment."""

from __future__ import annotations

import pytest

from funnel_report_etl_pipeline__spark.plans.registry import load_all

from .conftest import SF_SMALL

SPECS = load_all()


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_join_strategy_independence(spark):
    """join_equi under forced sort-merge must equal the broadcast plan."""
    q = SPECS["join_equi"].fn
    with_broadcast = _rows(q(spark, SF_SMALL))
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        forced_smj = _rows(q(spark, SF_SMALL))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    assert with_broadcast == forced_smj


@pytest.mark.parametrize("name", ["agg_sum_cast", "pricing_summary", "funnel_waterfall"])
def test_shuffle_partition_invariance(name, spark):
    """Exact-decimal sums make double results identical at any parallelism
    (a plain double SUM would drift in the last ulp)."""
    q = SPECS[name].fn
    base = _rows(q(spark, SF_SMALL))
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        low_par = _rows(q(spark, SF_SMALL))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    assert base == low_par


@pytest.mark.parametrize(
    "name",
    [
        # round-6 integer-exact claims: assignment/rank/statistic must be
        # bit-identical at any parallelism
        "kmeans_lloyd_clusters",
        "kmeans_balanced_sample",
        "pagerank_coorder",
        "ks_drift_value",
        "partition_freshness_audit",
        "cross_source_duplication",
    ],
)
def test_round6_shuffle_partition_invariance(name, spark):
    q = SPECS[name].fn
    base = _rows(q(spark, SF_SMALL))
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        low_par = _rows(q(spark, SF_SMALL))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    assert base == low_par
