"""ANN scaling probe: PQ and medoid-IVF wall + recall at 1x/10x.

Planted-cluster corpora (the tests' construction: unit-norm cluster
centers, Gaussian noise, renormalized) at 5k and 50k vectors, dim 64.
For each scale and operator: wall time of the full retrieval and
recall@5 against the exact brute-force top-5 (PQ is re-ranked with exact
cosine over its ADC top-21 candidates — the standard PQ recipe and what
the operator docstring prescribes at scale).

Usage: PYSPARK_SUBMIT_ARGS="--driver-memory 16g pyspark-shell" \
       python tools/ann_probe.py [scales ...]     (default: 1 10)
Prints one JSON line per (scale, operator).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
from pyspark.sql import Window
from pyspark.sql import functions as F

from funnel_report_etl_pipeline__spark.operators.similarity import (
    cosine_topk_brute,
    cosine_topk_ivf_medoid,
    pq_topk,
)
from funnel_report_etl_pipeline__spark.session import get_spark

DIM = 64
NOISE = 0.05
PER_CLUSTER = 100


def planted(spark, n_clusters: int):
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((n_clusters, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.repeat(centers, PER_CLUSTER, axis=0) + rng.normal(
        0, NOISE, (n_clusters * PER_CLUSTER, DIM)
    )
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    df = (
        spark.createDataFrame(
            [(i, row.tolist()) for i, row in enumerate(vecs)],
            "vec_id long, embedding array<double>",
        )
        .repartition(32)
        .cache()
    )
    df.count()
    return df


def recall_at_k(approx, exact, k: int = 5) -> float:
    """approx/exact: dict qid -> list of cids (top-k)."""
    hits = sum(len(set(approx.get(q, [])[:k]) & set(v[:k])) for q, v in exact.items())
    return hits / (k * len(exact))


def topk_dict(df, k: int = 5):
    out: dict[int, list[int]] = {}
    for r in df.orderBy("qid", "rnk").collect():
        out.setdefault(r.qid, [])
        if len(out[r.qid]) < k:
            out[r.qid].append(r.cid)
    return out


def probe(spark, mult: int) -> dict:
    """Measure wall + recall@5 for brute / medoid-IVF / PQ-rerank at one
    scale. Importable: tests/test_similarity.py's opt-in scale tests call
    this and ASSERT the recall floor (round-6 verdict item 6 — the probe
    alone recorded recall but nothing failed if it dropped)."""
    corpus = planted(spark, 50 * mult)  # 5k / 50k vectors
    queries = corpus.filter(f"vec_id % {2 * PER_CLUSTER * mult} = 0")  # 25 queries at every scale
    nq = queries.count()

    t0 = time.perf_counter()
    exact = topk_dict(cosine_topk_brute(corpus, queries, k=5))
    t_brute = round(time.perf_counter() - t0, 2)

    # medoid-IVF: 64 cells, probe 4 (the k-means IVF test's setting)
    t0 = time.perf_counter()
    ivf = topk_dict(
        cosine_topk_ivf_medoid(corpus, queries, k=5, n_cells=64, n_probe=4)
    )
    t_ivf = round(time.perf_counter() - t0, 2)
    r_ivf = round(recall_at_k(ivf, exact), 3)

    # PQ: ADC top-21 candidates, exact-cosine re-rank in Spark
    t0 = time.perf_counter()
    # candidate depth ~ cluster size: ADC codes cannot order WITHIN a
    # 100-member planted cluster, so the re-rank pool must cover it
    cand = pq_topk(corpus, queries, k=PER_CLUSTER + 5).filter("qid != cid")
    emb = corpus.select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    qemb = corpus.select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    dot = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    rer = (
        cand.join(emb, "cid")
        .join(F.broadcast(qemb.join(queries.select(F.col("vec_id").alias("qid")), "qid")), "qid")
        .select("qid", "cid", dot.alias("cosine"))
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(
                    F.col("cosine").desc(), F.col("cid").asc()
                )
            ),
        )
        .filter("rnk <= 5")
    )
    pq = topk_dict(rer)
    t_pq = round(time.perf_counter() - t0, 2)
    r_pq = round(recall_at_k(pq, exact), 3)

    out = {
                "scale": mult,
                "n_vectors": 50 * mult * PER_CLUSTER,
                "n_queries": nq,
                "brute_sec": t_brute,
                "ivf_medoid_sec": t_ivf,
                "ivf_medoid_recall5": r_ivf,
                "pq_rerank_sec": t_pq,
                "pq_rerank_recall5": r_pq,
    }
    corpus.unpersist()
    return out


def main() -> int:
    scales = [int(s) for s in sys.argv[1:]] or [1, 10]
    spark = get_spark(app_name="ann_probe")
    for mult in scales:
        print(json.dumps(probe(spark, mult)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
