"""Relational scaling probe: replicate the FACT tables (lineitem, orders)
N× with offset order keys while the dimensions stay fixed — the realistic
growth shape — and time the TPC-H-style join queries end-to-end. Linear
wall growth here is the measured evidence that the broadcast-dimension /
single-fact-shuffle plans survive a scale-up (a super-linear curve would
mean a dimension leg stopped broadcasting or a join key collapsed).

Usage: PYSPARK_SUBMIT_ARGS="--driver-memory 16g pyspark-shell" \
       python tools/tpch_scale_probe.py [scales ...]   (default: 1 4 10)
Prints one JSON line per (query, scale).
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from funnel_report_etl_pipeline__spark.plans.registry import load_all  # noqa: E402
from funnel_report_etl_pipeline__spark.session import get_spark  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
DIMS = ("region", "nation", "customer", "supplier", "part")
FACTS = ("orders", "lineitem")
QUERIES = (
    "nation_market_share",
    "product_type_profit",
    "volume_shipping",
    "returned_item_report",
    "large_volume_orders",
    "shipping_priority_topk",
    # round-8 shapes
    "small_quantity_revenue",
    "top_supplier_revenue",
    "disjunctive_brand_revenue",
    "sole_return_supplier",
    "sole_return_supplier_agg",
    "order_priority_return_check",
    # round-8 late batch (Q2/Q11/Q16/Q20 shapes)
    "min_cost_supplier",
    "important_nation_value",
    "supplier_part_variety",
    "excess_shipment_suppliers",
    # round-8 final batch (Q6 pushdown scan, Q12 fact-fact join)
    "forecast_revenue_change",
    "shipping_class_priority",
    # the five shapes that predate the probe — included so the probe
    # covers every TPC-H query shape in the registry
    "pricing_summary",
    "local_supplier_volume",
    "customer_order_distribution",
    "promo_revenue_pct",
    "lapsed_highvalue_customers",
    # round-8 extension: fact-consuming audits — the CMS sketch's
    # constant (d×w) exchange, the t-closeness integer EMD over a
    # replicated orders fact, and the co-order graph moments (replicas
    # re-create the same distinct edge set, so the probe isolates the
    # edge-build stage's scaling)
    "cms_frequency_calibration",
    "t_closeness_profile",
    "degree_assortativity",
    "k_core_peeling",
    # round-8 close batch #2: the fact-consuming stats/ETL shapes
    # (markov/contamination consume events/documents — probed inline,
    # see PLANS.md)
    "ols_brand_price_quantity",
    "chi_square_flag_status",
    "assoc_rules_brand",
    "priority_change_intervals",
    "ewma_revenue_anomaly",
    "community_modularity",
    "gini_impurity_segments",
    "equidepth_price_histogram",
    "equidepth_price_histogram_approx",
    "weekday_seasonality",
    "winsorized_revenue_mean",
    "winsorized_revenue_mean_approx",
    "table_profile_orders",
)
_KEY_STRIDE = 100_000_000


def synth_sf(spark, mult: int, out: str) -> None:
    """Write a synthetic sf dir: dims verbatim, facts replicated ``mult``×
    with order keys offset per copy (so every copy joins the same dims but
    no order key collides), as multi-file parquet so scans parallelize."""
    for t in DIMS:
        spark.read.parquet(f"{BASE_SF}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")
    for t, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        base = spark.read.parquet(f"{BASE_SF}/{t}.parquet")
        parts = [
            base.withColumn(key, F.col(key) + F.lit(i * _KEY_STRIDE))
            for i in range(mult)
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.repartition(32).write.mode("overwrite").parquet(f"{out}/{t}.parquet")


def main() -> int:
    # integer args are scales; non-integer args select a query subset
    # (e.g. `tpch_scale_probe.py 1 10 cms_frequency_calibration`)
    scales = [int(s) for s in sys.argv[1:] if s.isdigit()] or [1, 4, 10]
    picked = tuple(s for s in sys.argv[1:] if not s.isdigit()) or QUERIES
    spark = get_spark(app_name="tpch_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    # scale probes run the *_approx sketch queries PAST their oracle
    # exactness regime on purpose — that approximate behavior is the
    # 100 TB path under measurement, so relax the hash-gate guard
    spark.conf.set("spark.funnel.sketchExactRegimeGuard", "false")
    specs = load_all()
    for mult in scales:
        out = tempfile.mkdtemp(prefix=f"tpch_scale_{mult}x_")
        synth_sf(spark, mult, out)
        n_li = spark.read.parquet(f"{out}/lineitem.parquet").count()
        for q in picked:
            fn = specs[q].fn
            fn(spark, out).collect()  # warm (codegen + broadcast build)
            t0 = time.perf_counter()
            rows = len(fn(spark, out).collect())
            wall = round(time.perf_counter() - t0, 3)
            print(
                json.dumps(
                    {"query": q, "scale": mult, "lineitem_rows": n_li,
                     "rows_out": rows, "sec": wall}
                )
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
