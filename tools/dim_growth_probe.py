"""End-to-end exercise of ``maybe_broadcast``'s DEGRADE path.

The size-gated hint (functions/hints.py) has two behaviors: under the
gate it pins the gate-scale broadcast plan; past the gate it returns the
frame UN-hinted so AQE picks the join strategy from runtime stats. The
under-gate side is exercised by every TPC-H bench run; this probe earns
the above-gate side end-to-end (round-8 verdict ask #6), which unit
tests previously covered only at the helper level:

1. Replicates the customer and part DIMENSIONS ``mult``× with offset
   keys (facts verbatim — the inverse of tpch_scale_probe's growth
   shape) until their optimizer size estimate exceeds the 256 MiB gate.
2. Asserts ``maybe_broadcast`` now degrades the grown scans to the
   merge (sort-merge) hint (no broadcast hint), and that the queries'
   physical plans place NO broadcast join on the grown dimension key.
   The FIRST run of this probe is what forced that design: with the hint
   merely absent, Catalyst/AQE's column-pruned compressed-size estimates
   still chose broadcast — one query ran 14× slow behind a 30M-row
   broadcast build, another died with "Not enough memory to build and
   broadcast" — so the degrade side pins a non-broadcast strategy.
   Round 9 pinned shuffle_hash; round 10 moved the pin to merge because
   a ShuffledHashJoin build-side hash map cannot spill (a skewed key or
   a dim past this probe's 2048× could OOM one executor), while the SMJ
   sorter spills to disk.
3. Runs three maybe_broadcast-consuming TPC-H shapes to completion on
   the grown dir and hash-compares each against its registered DuckDB
   oracle over the SAME grown tables — the degrade path must stay
   value-correct, not merely finish.

Replicated dim rows carry offset keys, so no fact row matches a clone:
results equal the base-dir results for inner-join shapes, and the
oracle runs on the grown dir so even outer/distribution shapes compare
apples-to-apples.

Usage: PYSPARK_SUBMIT_ARGS="--driver-memory 16g pyspark-shell" \\
       python tools/dim_growth_probe.py [mult]        (default 512)
Prints one JSON line per query.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, ".")

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from funnel_report_etl_pipeline__spark.functions.hints import (
    estimated_size_bytes,
    maybe_broadcast,
)
from funnel_report_etl_pipeline__spark.plans.registry import load_all
from funnel_report_etl_pipeline__spark.session import get_spark

BASE_SF = "/root/testdata/sf0.1"
GROWN_DIMS = {"customer": "c_custkey", "part": "p_partkey"}
VERBATIM = ("region", "nation", "supplier", "orders", "lineitem")
# three shapes whose grown-dim join goes through maybe_broadcast
QUERIES = {
    "winsorized_revenue_mean": "c_custkey",
    "gini_impurity_segments": "c_custkey",
    "ols_brand_price_quantity": "p_partkey",
}
_KEY_STRIDE = 1_000_000_000


def synth_grown_dims(spark, mult: int, out: str) -> None:
    for t in VERBATIM:
        os.symlink(f"{BASE_SF}/{t}.parquet", f"{out}/{t}.parquet")
    for t, key in GROWN_DIMS.items():
        base = spark.read.parquet(f"{BASE_SF}/{t}.parquet")
        reps = F.broadcast(spark.range(mult).withColumnRenamed("id", "__rep"))
        df = (
            base.crossJoin(reps)
            .withColumn(key, F.col(key) + F.col("__rep") * F.lit(_KEY_STRIDE))
            .drop("__rep")
        )
        df.repartition(32).write.mode("overwrite").parquet(f"{out}/{t}.parquet")


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    # default 2048: replicated dim rows dictionary/RLE-compress so well
    # that 512x left the parquet footprint (the optimizer's estimate) at
    # only ~85-100 MB — the gate reads FILE bytes, not logical rows
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    spark = get_spark(app_name="dim_growth_probe")
    spark.sparkContext.setLogLevel("ERROR")
    out = tempfile.mkdtemp(prefix=f"dim_growth_{mult}x_")
    synth_grown_dims(spark, mult, out)

    failures = 0
    gate = 256 << 20
    for t in GROWN_DIMS:
        scan = spark.read.parquet(f"{out}/{t}.parquet")
        est = estimated_size_bytes(scan)
        lp = maybe_broadcast(scan)._jdf.queryExecution().logical().toString()
        degraded = "merge" in lp.lower() and "broadcast" not in lp.lower()
        print(
            json.dumps(
                {"dim": t, "rows": scan.count(), "est_bytes": est,
                 "past_gate": bool(est and est > gate),
                 "hint_degraded_to_merge": degraded}
            ),
            flush=True,
        )
        if not est or est <= gate or not degraded:
            failures += 1

    specs = load_all()
    con = duckdb.connect()
    for t in list(GROWN_DIMS) + list(VERBATIM):
        p = f"{out}/{t}.parquet"
        if os.path.isdir(p):  # Spark multi-file write
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    import time

    for q, key in QUERIES.items():
        df = specs[q].fn(spark, out)
        phys = df._jdf.queryExecution().executedPlan().toString()
        # the grown-dim join must NOT be a broadcast join: no
        # BroadcastHashJoin node may carry the grown key
        bcast_on_dim = any(
            key in ln for ln in phys.splitlines() if "BroadcastHashJoin" in ln
        )
        t0 = time.perf_counter()
        got = _canon(df.toPandas())
        wall = round(time.perf_counter() - t0, 3)
        want = _canon(con.execute(specs[q].oracle).fetchdf())
        rows_ok = len(got) == len(want)
        vals_ok = rows_ok and got.shape == want.shape and bool(
            (got.values == want.values).all()
        )
        ok = (not bcast_on_dim) and vals_ok
        failures += 0 if ok else 1
        print(
            json.dumps(
                {"query": q, "grown_key": key, "sec": wall,
                 "broadcast_on_grown_dim": bcast_on_dim,
                 "rows": len(got), "oracle_match": bool(vals_ok), "ok": ok}
            ),
            flush=True,
        )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
