"""Process-isolated A/B: run N bench-style timed runs of the given
queries in a FRESH JVM, importing the tree at CWD. Compare by running it
from two different worktrees (same command, different cwd) — no
sys.modules surgery, no shared-JVM state bleed (the 1 GB local JVM made
same-session A/B phases drift by more than the effects under test).

Usage: (cd <tree>; python <repo>/tools/r15_fresh_ab.py q1 q2 --runs 5)
Prints one line per query: median/min/max of the timed runs after one
untimed warm-up, release_all_caches between runs (bench.py hygiene).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.getcwd())

from funnel_report_etl_pipeline__spark.plans.registry import load_all  # noqa: E402
from funnel_report_etl_pipeline__spark.session import (  # noqa: E402
    get_spark,
    release_all_caches,
)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 5
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r15_fresh_ab")
    specs = load_all()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in args:
        spec = specs[name]
        spec.fn(spark, sf_dir).collect()
        release_all_caches(spark)
        xs = []
        for _ in range(runs):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).collect()
            xs.append(time.perf_counter() - t0)
            release_all_caches(spark)
        xs.sort()
        print(
            f"{name:32s} med={xs[len(xs) // 2]:.3f} min={xs[0]:.3f} "
            f"max={xs[-1]:.3f} cwd={os.path.basename(os.getcwd())}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
