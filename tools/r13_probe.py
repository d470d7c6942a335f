"""Round-13 scaling probes: O(changes) mixed-span CDF, tombstone-masked
ANN deletes, and partition-pruned versioned reads.

* span_cdf — a FIXED set of changes (1k delta, 500 deletes, 500-row
  merge) on top of a snapshot mult× bigger; times the mixed-span feed
  (v1 → head) through the new commit-dir net-multiplicity path vs the
  two-snapshot multiplicity fallback on the same span. Claim: the new
  path reads O(changes) bytes — near-flat as the base grows — while
  the fallback assembles BOTH endpoint snapshots and scales with the
  table (round-12 verdict's #1 scale blemish, now fixed).
* ann_masked_delete — a FIXED 1k-id delete from a corpus mult× bigger;
  times ensure_ivf_index_versioned's masked path + a served query vs a
  from-scratch full build at the same scale. Claim: the masked path
  writes O(deleted) bytes (its corpus-grain work is the id-only
  signature/medoid checks), so masked≪rebuild and the gap widens.
* partition_prune — a lang-partitioned versioned table where ONE
  partition stays fixed-size while the others grow mult×; times the
  pruned read of the fixed partition vs the full-table scan. Claim:
  the pruned read tracks the SELECTED PARTITION's size, not the
  table's.

Usage: PYSPARK_SUBMIT_ARGS="--driver-memory 16g pyspark-shell" \
       python tools/r13_probe.py [scales ...]     (default: 1 10)
Prints one JSON line per (probe, scale); capture stdout to a file
(Spark's progress bar corrupts pipes).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np
from pyspark.sql import functions as F

from funnel_report_etl_pipeline__spark.session import get_spark
from funnel_report_etl_pipeline__spark.sources.sinks import (
    _multiplicity_changes,
    append_versioned,
    delete_versioned,
    merge_versioned,
    read_versioned,
    version_changes,
    write_versioned,
)

DIM = 64


def _docs(spark, n: int, parts: int = 32):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.md5(F.col("id").cast("string")).alias("text"),
            (F.col("id") % 20).cast("string").alias("lang"),
        )
        .repartition(parts)
    )


def probe_span_cdf(spark, mult: int) -> dict:
    base = 200_000 * mult
    docs = _docs(spark, base + 2_000)
    t = tempfile.mkdtemp(prefix="r13_span_probe_")
    try:
        write_versioned(docs.filter(f"doc_id < {base}"), t, id_col="doc_id")
        append_versioned(
            docs.filter(f"doc_id >= {base} AND doc_id < {base + 1000}"),
            t, id_col="doc_id",
        )
        delete_versioned(
            spark, t, docs.filter("doc_id < 500").select("doc_id"),
            id_col="doc_id",
        )
        merge_versioned(
            spark, t,
            docs.filter(f"doc_id >= {base + 1000} AND doc_id < {base + 1500}")
            .withColumn("text", F.lit("m")),
            id_col="doc_id",
        )
        t0 = time.monotonic()
        n_fast = version_changes(spark, t, 1, 4, "doc_id").count()
        fast_wall = time.monotonic() - t0
        t0 = time.monotonic()
        n_fb = _multiplicity_changes(
            read_versioned(spark, t, 1), read_versioned(spark, t, 4),
            "doc_id", False,
        ).count()
        fb_wall = time.monotonic() - t0
        assert n_fast == n_fb, (n_fast, n_fb)
        return {
            "probe": "span_cdf",
            "scale": mult,
            "snapshot_rows": base,
            "feed_rows": n_fast,
            "commit_dir_path_s": round(fast_wall, 3),
            "two_snapshot_fallback_s": round(fb_wall, 3),
        }
    finally:
        shutil.rmtree(t, ignore_errors=True)


def _vectors(spark, n: int, parts: int = 32):
    rng = np.random.default_rng(13)
    vecs = rng.normal(size=(n, DIM)).astype(float)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(parts)


def probe_ann_masked_delete(spark, mult: int) -> dict:
    from funnel_report_etl_pipeline__spark.operators.ann_index import (
        build_ivf_medoid_index,
        cosine_topk_ivf_prebuilt,
        ensure_ivf_index_versioned,
    )

    base = 20_000 * mult
    emb = _vectors(spark, base)
    # the fixed 1k-victim set avoids the medoid region (64 lowest md5)
    # so the masked path provably applies
    low = [
        r["vec_id"]
        for r in emb.select("vec_id")
        .withColumn("k", F.md5(F.col("vec_id").cast("string")))
        .orderBy("k", "vec_id").limit(64).collect()
    ]
    victims = emb.filter(
        (F.col("vec_id") % (base // 1000) == 7) & ~F.col("vec_id").isin(*low)
    ).select("vec_id")
    root = tempfile.mkdtemp(prefix="r13_ann_mask_probe_")
    try:
        tbl, idx = f"{root}/corpus", f"{root}/ivf"
        write_versioned(emb, tbl, id_col="vec_id")
        ensure_ivf_index_versioned(spark, tbl, idx, n_cells=16)
        delete_versioned(spark, tbl, victims, id_col="vec_id")
        t0 = time.monotonic()
        m = ensure_ivf_index_versioned(spark, tbl, idx, n_cells=16)
        mask_wall = time.monotonic() - t0
        assert m["maintenance"] == "masked", m["maintenance"]
        live = read_versioned(spark, tbl)
        q = emb.filter(F.col("vec_id") % 997 == 3)
        t0 = time.monotonic()
        served = cosine_topk_ivf_prebuilt(live, q, idx, k=5, n_probe=2).count()
        serve_wall = time.monotonic() - t0
        t0 = time.monotonic()
        build_ivf_medoid_index(live, f"{root}/full", n_cells=16)
        rebuild_wall = time.monotonic() - t0
        return {
            "probe": "ann_masked_delete",
            "scale": mult,
            "corpus_rows": base,
            "deleted_rows": int(m["n_masked"]),
            "masked_maintenance_s": round(mask_wall, 3),
            "masked_serve_s": round(serve_wall, 3),
            "served_rows": served,
            "full_rebuild_s": round(rebuild_wall, 3),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def probe_partition_prune(spark, mult: int) -> dict:
    # one fixed-size partition (lang '0': 10k rows always) among
    # growing others: ids < 10k*20 keep lang = id % 20; the growth
    # region (ids past that) never lands in lang '0'
    fixed_region = 200_000
    grow = 200_000 * (mult - 1)
    n = fixed_region + grow
    docs = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.md5(F.col("id").cast("string")).alias("text"),
            F.when(F.col("id") < fixed_region, (F.col("id") % 20))
            .otherwise(1 + (F.col("id") % 19))
            .cast("string")
            .alias("lang"),
        )
        .repartition(32)
    )
    t = tempfile.mkdtemp(prefix="r13_part_probe_")
    try:
        write_versioned(
            docs.filter("doc_id % 2 = 0"), t, id_col="doc_id",
            partition_by=["lang"],
        )
        append_versioned(docs.filter("doc_id % 2 = 1"), t, id_col="doc_id")
        # sum over a data column forces real page reads on both sides —
        # a bare count() would serve from parquet row-group metadata and
        # understate the full-scan baseline
        def _scan_cost(df) -> tuple[int, float]:
            t0 = time.monotonic()
            row = df.agg(
                F.count("*").alias("n"),
                F.sum(F.length("text")).alias("b"),
            ).collect()[0]
            return int(row["n"]), time.monotonic() - t0

        n_pruned, pruned_wall = _scan_cost(
            read_versioned(spark, t).filter(F.col("lang") == "0")
        )
        n_all, full_wall = _scan_cost(read_versioned(spark, t))
        return {
            "probe": "partition_prune",
            "scale": mult,
            "table_rows": n_all,
            "partition_rows": n_pruned,
            "pruned_read_s": round(pruned_wall, 3),
            "full_scan_s": round(full_wall, 3),
        }
    finally:
        shutil.rmtree(t, ignore_errors=True)


def main() -> int:
    scales = [int(a) for a in sys.argv[1:]] or [1, 10]
    spark = get_spark("r13_probe")
    spark.sparkContext.setLogLevel("ERROR")
    # untimed warm-up pass: the first probe in a fresh JVM measures its
    # own codegen/page-cache debt, not its plan (the round-8 lesson)
    for fn in (probe_span_cdf, probe_ann_masked_delete, probe_partition_prune):
        fn(spark, 1)
    for mult in scales:
        for fn in (
            probe_span_cdf, probe_ann_masked_delete, probe_partition_prune
        ):
            print(json.dumps(fn(spark, mult)), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
