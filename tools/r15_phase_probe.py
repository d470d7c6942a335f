"""Phase probe: split each query's wall time into CONSTRUCT (fn() call —
includes ensure_* index actions, localCheckpoints, driver-side counts)
vs EXECUTE (noop-sink write of the returned frame) vs COLLECT (what
bench.py times end-to-end), after one untimed warm-up. Guide §1.4: the
noop sink computes every column of every row without sink cost.

Usage: python tools/r15_phase_probe.py q1 q2 ...   (default: top cost set)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from funnel_report_etl_pipeline__spark.plans.registry import load_all  # noqa: E402
from funnel_report_etl_pipeline__spark.session import (  # noqa: E402
    get_spark,
    release_all_caches,
)

DEFAULT = [
    "k_core_peeling", "cms_frequency_calibration", "pagerank_coorder",
    "ann_ivfpq_prebuilt", "ann_ivfpq_rerank", "ann_ivfpq_residual",
    "minhash_jaccard_calibration", "degree_assortativity",
    "late_interaction_maxsim", "ann_pq_prebuilt", "community_modularity",
    "ann_ivf_prebuilt", "semantic_dedup_clusters",
    "late_interaction_maxsim_pruned", "dedup_cluster_quality_canon",
    "ann_recall_audit", "cdc_chunk_dedup", "dedup_minhash_fast",
    "minhash_band_skew", "dedup_clusters",
]


def main() -> int:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r15_phase_probe")
    specs = load_all()
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up
    print(f"{'query':35s} {'construct':>9s} {'noop':>8s} {'collect':>8s} {'total':>8s}")
    for name in names:
        spec = specs[name]
        try:
            spec.fn(spark, sf_dir).collect()  # untimed warm-up
            release_all_caches(spark)
            spark.sparkContext.setJobDescription(f"probe:{name}")
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            df.collect()
            t3 = time.perf_counter()
            print(
                f"{name:35s} {t1 - t0:9.3f} {t2 - t1:8.3f} {t3 - t2:8.3f}"
                f" {t3 - t0:8.3f}"
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name:35s} PROBE-FAIL {type(e).__name__}: {e}")
        finally:
            release_all_caches(spark)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
