"""Bucketed-layout probe: measure the shuffle-free join the bucketed
parquet layout buys at N× the bench scale.

`write_bucketed` (sources/sinks.py) is plan-asserted at testdata scale in
tests/test_bucketing.py; this probe demonstrates it where it matters —
the 10× fact⋈fact join — by writing the scaled orders/lineitem pair both
ways and timing the identical join+agg:

* shuffled baseline: plain parquet, broadcast disabled → two
  `Exchange hashpartitioning` on the join keys feed the SortMergeJoin;
* bucketed layout: both sides `bucketBy(32, orderkey)` → the join reads
  pre-partitioned buckets and the ONLY exchange left is the final small
  groupBy. The probe asserts that plan property (it does not merely time
  and hope).

At 100 TB the two deleted exchanges are the dominant cost of every
fact⋈fact query, and the bucketed write is a one-time cost amortized over
every subsequent join on that key — the probe prints it separately.

Usage: python tools/bucket_probe.py [scales ...]   (default: 1 10)
Prints one JSON line per scale.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"


def synth_fact_pair(spark, mult: int, out_dir: str):
    """mult copies of the sf0.1 orders/lineitem with shifted orderkeys —
    key cardinality grows with scale (the realistic shape: more orders,
    not more lines per order), written multi-file so scans parallelize."""
    from funnel_report_etl_pipeline__spark.sources.readers import TestDataCatalog

    cat = TestDataCatalog(spark, BASE_SF)
    shift = 100_000_000
    o_parts, l_parts = [], []
    for i in range(mult):
        o_parts.append(
            cat.table("orders").select(
                (F.col("o_orderkey") + F.lit(i * shift)).alias("o_orderkey"),
                "o_custkey",
                "o_orderstatus",
                "o_totalprice",
                "o_orderdate",
                "o_orderpriority",
            )
        )
        l_parts.append(
            cat.table("lineitem").select(
                (F.col("l_orderkey") + F.lit(i * shift)).alias("l_orderkey"),
                "l_partkey",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
                "l_returnflag",
            )
        )
    orders = o_parts[0]
    for p in o_parts[1:]:
        orders = orders.unionByName(p)
    lineitem = l_parts[0]
    for p in l_parts[1:]:
        lineitem = lineitem.unionByName(p)
    orders.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/orders")
    lineitem.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/lineitem")
    return (
        spark.read.parquet(f"{out_dir}/orders"),
        spark.read.parquet(f"{out_dir}/lineitem"),
    )


def _join_agg(orders, lineitem):
    """The probe workload: fact⋈fact on orderkey, small final rollup."""
    return (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )
    )


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def probe_bucketed_join(spark, mult: int, tmp: str, n_buckets: int = 32) -> dict:
    """Write the mult× fact pair plain and bucketed; time the identical
    join+agg both ways with broadcast disabled; assert the bucketed plan
    is exchange-free on the join keys. Returns the measurement dict."""
    orders, lineitem = synth_fact_pair(spark, mult, f"{tmp}/x{mult}")
    n_li = lineitem.count()

    ot, lt = f"orders_probe_x{mult}", f"lineitem_probe_x{mult}"
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        from funnel_report_etl_pipeline__spark.sources.sinks import write_bucketed

        t0 = time.perf_counter()
        write_bucketed(orders, ot, ["o_orderkey"], n_buckets=n_buckets)
        write_bucketed(lineitem, lt, ["l_orderkey"], n_buckets=n_buckets)
        t_write = round(time.perf_counter() - t0, 2)

        shuffled_q = _join_agg(orders, lineitem)
        bucketed_q = _join_agg(spark.table(ot), spark.table(lt))

        plan_b = _plan_of(bucketed_q)
        plan_s = _plan_of(shuffled_q)
        exchange_free = (
            "Exchange hashpartitioning(o_orderkey" not in plan_b
            and "Exchange hashpartitioning(l_orderkey" not in plan_b
        )
        baseline_shuffles = (
            "Exchange hashpartitioning(o_orderkey" in plan_s
            and "Exchange hashpartitioning(l_orderkey" in plan_s
        )
        if not exchange_free:
            raise AssertionError(f"bucketed plan still exchanges:\n{plan_b}")
        if not baseline_shuffles:
            raise AssertionError(f"baseline lost its exchanges:\n{plan_s}")

        t0 = time.perf_counter()
        res_s = {tuple(r) for r in shuffled_q.collect()}
        t_shuffled = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        res_b = {tuple(r) for r in bucketed_q.collect()}
        t_bucketed = round(time.perf_counter() - t0, 2)

        if {r[0:2] for r in res_b} != {r[0:2] for r in res_s}:
            raise AssertionError("bucketed and shuffled results disagree")

        return {
            "scale": mult,
            "n_lineitem": n_li,
            "bucketed_write_sec": t_write,
            "shuffled_join_sec": t_shuffled,
            "bucketed_join_sec": t_bucketed,
            "bucketed_plan_exchange_free": exchange_free,
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        spark.sql(f"DROP TABLE IF EXISTS {ot}")
        spark.sql(f"DROP TABLE IF EXISTS {lt}")


def main() -> int:
    from funnel_report_etl_pipeline__spark.session import get_spark

    scales = [int(a) for a in sys.argv[1:]] or [1, 10]
    spark = get_spark(app_name="bucket_probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up
    tmp = tempfile.mkdtemp(prefix="bucket_probe_")
    for mult in scales:
        print(json.dumps(probe_bucketed_join(spark, mult, tmp)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
