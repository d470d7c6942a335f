"""k-means scaling probe: wall time of kmeans_lloyd_clusters at 1x/10x
the bench corpus, so the 'centroid side broadcasts, Lloyd scales in the
data' claim is measured. Synthesizes Nx the sf0.1 embeddings (perturbed
ids, multi-file parquet so the scan parallelizes) under /tmp.

Usage: PYSPARK_SUBMIT_ARGS="--driver-memory 16g pyspark-shell" \
       python tools/kmeans_probe.py [scales ...]   (default: 1 10)
Prints one JSON line per scale.
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


def synth(spark, mult: int, out: str) -> int:
    emb = spark.read.parquet(f"{BASE_SF}/embeddings.parquet")
    parts = [
        emb.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
            "embedding",
            "label",
        )
        for i in range(mult)
    ]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.repartition(32).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    return spark.read.parquet(f"{out}/embeddings.parquet").count()


def main() -> int:
    scales = [int(a) for a in sys.argv[1:]] or [1, 10]
    spark = get_spark(app_name="kmeans_probe")
    spec = load_all()["kmeans_lloyd_clusters"]
    for mult in scales:
        with tempfile.TemporaryDirectory(prefix=f"km{mult}x_") as d:
            n = synth(spark, mult, d)
            t0 = time.monotonic()
            rows = spec.fn(spark, d).collect()
            wall = round(time.monotonic() - t0, 3)
            sizes = sorted(r.n_members for r in rows)
            print(
                json.dumps(
                    {
                        "probe": "kmeans_lloyd_clusters",
                        "scale": mult,
                        "n_vectors": n,
                        "wall_s": wall,
                        "n_clusters": len(rows),
                        "cluster_sizes": sizes,
                    }
                )
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
