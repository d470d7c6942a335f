"""Bucketed co-located join: the fact⋈fact shuffle disappears."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from funnel_report_etl_pipeline__spark.sources.readers import TestDataCatalog
from funnel_report_etl_pipeline__spark.sources.sinks import write_bucketed

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    cat = TestDataCatalog(spark, SF_SMALL)
    write_bucketed(cat.table("orders"), "orders_b", ["o_orderkey"], n_buckets=8)
    write_bucketed(cat.table("lineitem"), "lineitem_b", ["l_orderkey"], n_buckets=8)
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    ot, lt = bucketed_tables
    # force the non-broadcast path so the join strategy is key-partitioned
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table(ot)
        li = spark.table(lt)
        joined = o.join(li, o.o_orderkey == li.l_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count("*").alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the JOIN inputs must not be re-exchanged: the only allowed
        # exchange is the final small groupBy
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        # and it still computes the right answer
        unbucketed = (
            TestDataCatalog(spark, SF_SMALL)
            .table("orders")
            .join(
                TestDataCatalog(spark, SF_SMALL).table("lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, unbucketed.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


@pytest.mark.scale
def test_bucketed_join_10x_exchange_free(spark, tmp_path):
    """Verdict item: demonstrate the shuffle-free join at probe scale.
    probe_bucketed_join itself raises if the bucketed plan re-exchanges
    either join key or if results diverge from the shuffled baseline."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))
    from bucket_probe import probe_bucketed_join

    out = probe_bucketed_join(spark, 10, str(tmp_path))
    assert out["bucketed_plan_exchange_free"]
    assert out["n_lineitem"] >= 500_000
