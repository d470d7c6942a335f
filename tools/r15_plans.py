"""Dump .explain("formatted") for bench queries into plans/r15/.

Usage:
    python tools/r15_plans.py before [query ...]   # -> plans/r15/<q>_before.txt
    python tools/r15_plans.py after  [query ...]   # -> plans/r15/<q>_after.txt

With no query names, dumps every bench=True query. Construction-side
actions (checkpoints, counts) run as part of fn(); the explain itself is
planning-only.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from funnel_report_etl_pipeline__spark.plans.registry import load_all  # noqa: E402
from funnel_report_etl_pipeline__spark.session import (  # noqa: E402
    get_spark,
    release_all_caches,
)


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r15",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="r15_plans")
    specs = load_all()
    if not names:
        names = sorted(n for n, s in specs.items() if s.bench)
    for name in names:
        try:
            spark.sparkContext.setJobDescription(f"plan:{name}")
            df = specs[name].fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(txt)
            print(f"wrote {path}")
        except Exception as e:  # noqa: BLE001
            print(f"PLAN-FAIL {name}: {type(e).__name__}: {e}", file=sys.stderr)
        finally:
            release_all_caches(spark)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
