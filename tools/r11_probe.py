"""Round-11 scaling probes: compaction, MaxSim, residual IVF-PQ serve.

* compaction — a stream-shaped table (1 snapshot + n_deltas delta
  commits); measures head-read wall BEFORE vs AFTER compact_versioned
  and the compaction wall itself, at 1x and 10x snapshot size. Claim
  under test: read cost grows with chain length until compaction
  resets it to one-dir cost; compaction itself is one linear rewrite.
* maxsim — late-interaction retrieval wall at 1x/10x corpus docs
  (fixed 5 queries x 10 tokens). Claim: |Q_tokens| x corpus-tokens
  bounded, queries broadcast — linear in the corpus.
* residual serve — ivfpq_residual_topk_prebuilt wall at 1x/10x corpus
  AND 10x queries (build excluded; the indexes are ensure_*'d first).
  Claim: probed-cell-bounded like the raw sibling.

Usage: PYSPARK_SUBMIT_ARGS="--driver-memory 16g pyspark-shell" \
       python tools/r11_probe.py [scales ...]     (default: 1 10)
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

from funnel_report_etl_pipeline__spark.operators.ann_index import (
    ensure_ivf_medoid_index,
    ensure_ivfpq_residual_index,
    ivfpq_residual_topk_prebuilt,
)
from funnel_report_etl_pipeline__spark.operators.similarity import maxsim_topk
from funnel_report_etl_pipeline__spark.session import get_spark
from funnel_report_etl_pipeline__spark.sources.sinks import (
    append_versioned,
    compact_versioned,
    read_versioned,
)

DIM = 64


def synth_vectors(spark, n: int, parts: int = 32):
    rng = np.random.default_rng(11)
    ids = np.arange(n)
    vecs = rng.normal(size=(n, DIM)).astype(float)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    rows = [(int(i), [float(x) for x in v]) for i, v in zip(ids, vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(parts)


def probe_compaction(spark, mult: int, n_deltas: int = 10) -> dict:
    base = 20_000 * mult
    docs = spark.range(base).select(
        F.col("id").alias("doc_id"),
        F.md5(F.col("id").cast("string")).alias("text"),
    )
    t = tempfile.mkdtemp(prefix="r11_compact_probe_")
    try:
        from funnel_report_etl_pipeline__spark.sources.sinks import write_versioned

        write_versioned(docs.filter(f"doc_id % {n_deltas + 1} = 0"), t, id_col="doc_id")
        for i in range(1, n_deltas + 1):
            append_versioned(
                docs.filter(f"doc_id % {n_deltas + 1} = {i}"), t, id_col="doc_id"
            )

        def read_wall() -> float:
            t0 = time.monotonic()
            read_versioned(spark, t).collect()
            return time.monotonic() - t0

        pre = read_wall()
        t0 = time.monotonic()
        compact_versioned(spark, t, id_col="doc_id")
        compact_wall = time.monotonic() - t0
        post = read_wall()
        return {
            "probe": "compaction",
            "scale": mult,
            "n_rows": base,
            "n_chain_dirs": n_deltas + 1,
            "read_pre_s": round(pre, 3),
            "compact_s": round(compact_wall, 3),
            "read_post_s": round(post, 3),
        }
    finally:
        shutil.rmtree(t, ignore_errors=True)


def probe_maxsim(spark, mult: int) -> dict:
    n_docs = 500 * mult
    toks_raw = synth_vectors(spark, n_docs * 10)
    toks = toks_raw.select(
        (F.col("vec_id") % n_docs).alias("doc"),
        F.floor(F.col("vec_id") / n_docs).alias("tp"),
        F.col("embedding").alias("v"),
    )
    qtoks = toks.filter("doc < 5").selectExpr("doc as qdoc", "tp as qtp", "v as qv")
    t0 = time.monotonic()
    n = maxsim_topk(toks, qtoks, n_query_tokens=10, k=3).collect()
    return {
        "probe": "maxsim",
        "scale": mult,
        "n_docs": n_docs,
        "n_corpus_tokens": n_docs * 10,
        "wall_s": round(time.monotonic() - t0, 3),
        "rows": len(n),
    }


def probe_maxsim_pruned(spark, mult: int) -> dict:
    """Pruned (IVF-probed candidates) vs exhaustive MaxSim at the same
    scale: the claim is the pruned form's scored-pair count — and past
    the fixed probe cost, its wall — stays a fraction of exhaustive."""
    from funnel_report_etl_pipeline__spark.operators.ann_index import (
        ensure_ivf_medoid_index,
    )
    from funnel_report_etl_pipeline__spark.operators.similarity import (
        _nearest_medoid_cells,
    )

    n_docs = 500 * mult
    flat = synth_vectors(spark, n_docs * 10)
    toks = flat.select(
        "vec_id",
        (F.col("vec_id") % n_docs).alias("doc"),
        F.floor(F.col("vec_id") / n_docs).alias("tp"),
        F.col("embedding").alias("v"),
    )
    qtoks = toks.filter("doc < 5 AND tp < 10").selectExpr(
        "doc as qdoc", "tp as qtp", "v as qv"
    )
    root = tempfile.mkdtemp(prefix="r11_maxsim_probe_")
    try:
        ivf_dir = f"{root}/ivf"
        # more cells at scale, as production would tune (selectivity is
        # the whole point of the probe)
        n_cells = 64
        ensure_ivf_medoid_index(flat, ivf_dir, n_cells=n_cells, vec_col="embedding")
        med = spark.read.parquet(f"{ivf_dir}/cells.parquet")
        assign = spark.read.parquet(f"{ivf_dir}/assignments.parquet")
        doc_cells = (
            assign.join(toks.select(F.col("vec_id").alias("cid"), "doc"), "cid")
            .select("doc", "cell").distinct()
        )
        probe_toks = toks.filter("doc < 5 AND tp < 2").select(
            "vec_id", "doc", F.col("v").alias("__v")
        )
        q_cells = (
            _nearest_medoid_cells(probe_toks, med.select("cell", "mv"), "vec_id", 2)
            .join(probe_toks.select("vec_id", "doc"), "vec_id")
            .select(F.col("doc").alias("qdoc"), "cell").distinct()
        )
        cand = (
            q_cells.join(doc_cells, "cell")
            .filter("qdoc != doc").select("qdoc", "doc").distinct()
        )
        n_cand = cand.count()
        t0 = time.monotonic()
        rows = maxsim_topk(
            toks.select("doc", "tp", "v"), qtoks, n_query_tokens=10, k=3,
            candidates=cand,
        ).collect()
        return {
            "probe": "maxsim_pruned",
            "scale": mult,
            "n_docs": n_docs,
            "n_candidate_pairs": n_cand,
            "exhaustive_pairs": 5 * (n_docs - 1),
            "wall_s": round(time.monotonic() - t0, 3),
            "rows": len(rows),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def probe_tombstone_delete(spark, mult: int) -> dict:
    """O(deleted) delete vs O(snapshot) recommit: delete a FIXED 1000
    ids from a snapshot mult× bigger. The tombstone commit's wall should
    stay near-flat (intersection is an id-only semi-join; the write is
    1000 ids) while the recommit alternative rewrites everything."""
    from funnel_report_etl_pipeline__spark.sources.sinks import (
        delete_versioned,
        read_versioned,
        write_versioned,
    )

    base = 100_000 * mult
    docs = spark.range(base).select(
        F.col("id").alias("doc_id"),
        F.md5(F.col("id").cast("string")).alias("text"),
    )
    t = tempfile.mkdtemp(prefix="r11_tomb_probe_")
    try:
        write_versioned(docs, t, id_col="doc_id")
        ids = spark.range(1000).select((F.col("id") * 97).alias("doc_id"))
        t0 = time.monotonic()
        delete_versioned(spark, t, ids, id_col="doc_id")
        del_wall = time.monotonic() - t0
        t0 = time.monotonic()
        n = read_versioned(spark, t).count()
        read_wall = time.monotonic() - t0
        # the recommit alternative, for the cost contrast
        t0 = time.monotonic()
        write_versioned(read_versioned(spark, t), t, id_col="doc_id")
        recommit_wall = time.monotonic() - t0
        return {
            "probe": "tombstone_delete",
            "scale": mult,
            "n_rows": base,
            "n_deleted": 1000,
            "delete_s": round(del_wall, 3),
            "read_after_s": round(read_wall, 3),
            "recommit_s": round(recommit_wall, 3),
            "live": n,
        }
    finally:
        shutil.rmtree(t, ignore_errors=True)


def probe_residual_serve(spark, mult: int) -> dict:
    n = 5_000 * mult
    corpus = synth_vectors(spark, n)
    root = tempfile.mkdtemp(prefix="r11_res_probe_")
    try:
        ivf_dir, res_dir = f"{root}/ivf", f"{root}/res"
        t0 = time.monotonic()
        ensure_ivf_medoid_index(corpus, ivf_dir, n_cells=16, vec_col="embedding")
        ensure_ivfpq_residual_index(corpus, res_dir, ivf_dir, n_segments=8, seg_dim=8)
        build_wall = time.monotonic() - t0
        queries = corpus.filter(f"vec_id % {n // (10 * mult)} = 0")  # 10x queries at 10x
        t0 = time.monotonic()
        rows = ivfpq_residual_topk_prebuilt(
            queries, ivf_dir, res_dir, k=5, n_probe=2
        ).collect()
        return {
            "probe": "residual_serve",
            "scale": mult,
            "n_vectors": n,
            "n_queries": 10 * mult,
            "build_s": round(build_wall, 3),
            "serve_s": round(time.monotonic() - t0, 3),
            "rows": len(rows),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> int:
    scales = [int(s) for s in sys.argv[1:]] or [1, 10]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for mult in scales:
        for fn in (
            probe_compaction,
            probe_maxsim,
            probe_maxsim_pruned,
            probe_residual_serve,
        ):
            print(json.dumps(fn(spark, mult)), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
