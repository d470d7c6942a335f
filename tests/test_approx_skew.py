"""Approximate-aggregate error bounds + salting result-equality."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from funnel_report_etl_pipeline__spark.functions.skew import salted_join, salted_grouped_agg, with_salt

from .conftest import SF_SMALL


def test_approx_distinct_within_rsd(spark):
    from funnel_report_etl_pipeline__spark.plans.registry import load_all

    rows = load_all()["approx_distinct_users"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        # the in-query bound check (|HLL − exact| ≤ 5% · exact) must hold —
        # the driver's oracle pins this TRUE
        assert r.hll_ok, f"{r.event_type}: HLL outside 5% of {r.exact_users}"
        assert r.exact_users > 0


def test_salted_agg_equals_plain(spark):
    df = spark.range(10_000).withColumn("k", (F.col("id") % 3).cast("string"))
    plain = {
        r.k: (r.cnt, r.total)
        for r in df.groupBy("k")
        .agg(F.count("*").alias("cnt"), F.sum("id").alias("total"))
        .collect()
    }
    salted = {
        r.k: (r.cnt, r.total)
        for r in salted_grouped_agg(
            df,
            keys=["k"],
            partial_aggs={"__c": F.count("*"), "__s": F.sum("id")},
            final_aggs={"cnt": F.sum("__c").cast("long"), "total": F.sum("__s")},
            n_salts=8,
        ).collect()
    }
    assert plain == salted


def test_salt_spreads_rows(spark):
    df = with_salt(spark.range(1000).repartition(4), n_salts=8)
    n_buckets = df.select("__salt").distinct().count()
    assert n_buckets > 1  # the hot key's rows really do split


def test_salted_join_matches_plain_join(spark):
    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")], "k long, v string"
    )
    right = spark.createDataFrame([(1, "X"), (2, "Y"), (9, "Z")], "k2 long, w string")
    plain = sorted(
        (r.k, r.v, r.w) for r in left.join(right, left.k == right.k2).collect()
    )
    salted = sorted(
        (r.k, r.v, r.w)
        for r in salted_join(left, right, "k", "k2", n_salts=4).collect()
    )
    assert plain == salted


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (5, "e")], "k long, v string")
    right = spark.createDataFrame([(1, "X")], "k2 long, w string")
    rows = {
        r.k: r.w for r in salted_join(left, right, "k", "k2", 4, "left").collect()
    }
    assert rows == {1: "X", 5: None}


def test_salted_join_rejects_outer(spark):
    df = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(df, df, "k", "k", how="full")


def test_salted_join_rejects_salt_name_clash(spark):
    df = spark.range(1).select(F.col("id").alias("k"), F.lit(0).alias("__sj_salt"))
    plain = spark.range(1).select(F.col("id").alias("k2"))
    with pytest.raises(ValueError, match="__sj_salt"):
        salted_join(df, plain, "k", "k2")


def test_approx_percentile_within_rank_error(spark):
    from funnel_report_etl_pipeline__spark.plans.registry import load_all

    from .conftest import SF_MED

    rows = load_all()["approx_percentiles"].fn(spark, SF_MED).collect()
    assert rows
    for r in rows:
        # the in-query rank-error bound (approx within the exact ±1%-rank
        # quantile band) must hold — the driver's oracle pins this TRUE
        assert r.gk_ok, f"{r.event_type}: GK sketch outside ±1% rank band"
        assert r.exact_p50 <= r.exact_p99
