"""Approximate-aggregate error bounds + salting result-equality."""

from __future__ import annotations

from pyspark.sql import functions as F

from funnel_report_etl_pipeline__spark.functions.skew import salted_grouped_agg, with_salt

from .conftest import SF_SMALL


def test_approx_distinct_within_rsd(spark):
    from funnel_report_etl_pipeline__spark.plans.registry import load_all

    rows = load_all()["approx_distinct_users"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        rel_err = abs(r.approx_users - r.exact_users) / max(r.exact_users, 1)
        assert rel_err < 0.05, f"{r.event_type}: {r.approx_users} vs {r.exact_users}"


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
