"""Measure what the bloom runtime filter saves at the join exchange.

Locally AQE broadcasts the urgent keyset, so the prune's target — the
lineitem shuffle feeding the exact join — never materializes at toy SF.
This probe disables broadcast hash joins to force the corpus-scale plan
shape (both join inputs exchange on orderkey) and reports, per variant,
the rows feeding the lineitem-side exchange (= shuffle payload) and the
end-to-end wall time.

Usage: PYSPARK_SUBMIT_ARGS="--driver-memory 16g pyspark-shell" \
       python tools/bloom_probe.py [sf_dir]
Prints one JSON line per variant.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from funnel_report_etl_pipeline__spark.functions.core import dsum  # noqa: E402
from funnel_report_etl_pipeline__spark.plans.pipeline_r8 import (  # noqa: E402
    bloom_mask,
    bloom_member_cond,
)
from funnel_report_etl_pipeline__spark.session import get_spark  # noqa: E402


def _agg(joined):
    return joined.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n_lines"),
        dsum(
            F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        ).alias("revenue"),
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="bloom_probe")
    spark.sparkContext.setLogLevel("ERROR")
    # force the corpus-scale shape: no broadcast hash join for the exact
    # join (the 1-row mask still rides a BroadcastNestedLoopJoin, which
    # the threshold does not govern)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    )
    base = li.select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    total = base.count()

    mask = bloom_mask(urgent, "o_orderkey")
    pruned = (
        base.crossJoin(F.broadcast(mask))
        .filter(bloom_member_cond("l_orderkey"))
        .drop("__mask")
    )
    variants = {
        "bloom_pruned": (pruned, _agg(
            pruned.join(urgent, pruned.l_orderkey == urgent.o_orderkey)
        )),
        "plain": (base, _agg(
            base.join(urgent, base.l_orderkey == urgent.o_orderkey)
        )),
    }

    for name, (feed, df) in variants.items():
        df.collect()  # warm (codegen + mask build caches nothing: re-runs)
        t0 = time.perf_counter()
        rows = df.collect()
        wall = round(time.perf_counter() - t0, 3)
        print(
            json.dumps(
                {
                    "variant": name,
                    "sf_dir": sf_dir,
                    "lineitem_rows": total,
                    "exchange_feed_rows": feed.count(),
                    "sec": wall,
                    "result_rows": len(rows),
                }
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
