"""Behavioral invariants for the round-4 pipeline extensions (oracle parity
itself is covered query-by-query in test_registry_parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from funnel_report_etl_pipeline__spark.plans.registry import load_all

from .conftest import SF_MED, SF_SMALL

SPECS = load_all()


def test_bigram_support_ratio_bounded(spark):
    rows = SPECS["bigram_lm_support"].fn(spark, SF_SMALL).collect()
    assert rows, "no documents scored"
    for r in rows:
        # every bigram's context count >= its bigram count, so the per-doc
        # sums preserve the bound and the ratio is a probability-like score
        assert r.sum_bigram_freq <= r.sum_context_freq
        assert 0.0 < r.support_ratio <= 1.0
        assert r.n_bigrams >= 1


def test_balanced_sample_rates_and_determinism(spark):
    d = spark.read.parquet(f"{SF_MED}/documents.parquet")
    totals = {r.source: r.n for r in d.groupBy("source").agg(F.count("*").alias("n")).collect()}
    m = min(totals.values())
    kept1 = SPECS["balanced_source_sample"].fn(spark, SF_MED).collect()
    kept2 = SPECS["balanced_source_sample"].fn(spark, SF_MED).collect()
    # content-addressed: bit-identical keep set on every run
    assert {(r.doc_id) for r in kept1} == {(r.doc_id) for r in kept2}
    by_src: dict[str, int] = {}
    for r in kept1:
        by_src[r.source] = by_src.get(r.source, 0) + 1
    for src, n_total in totals.items():
        rate = m / n_total
        n_kept = by_src.get(src, 0)
        # md5 fraction is uniform; 5 sigma of Binomial(n, rate)
        sigma = (n_total * rate * (1 - rate)) ** 0.5
        assert abs(n_kept - n_total * rate) <= max(5 * sigma, 3), (
            src, n_kept, n_total * rate,
        )


def test_length_buckets_are_powers_of_two(spark):
    rows = SPECS["length_buckets"].fn(spark, SF_MED).collect()
    assert rows
    for r in rows:
        assert 2**r.bucket <= r.min_tokens <= r.max_tokens < 2 ** (r.bucket + 1)
    assert sum(r.n_docs for r in rows) == 500


def test_semantic_lsh_pairs_subset_of_exact(spark):
    """The LSH-blocked pair set is a subset of the exact all-pairs twin at
    the same threshold — blocking can only MISS pairs, never invent them.
    (No recall floor here: at cosine 0.45 on uniform-random vectors the
    pair angle is ~63°, so 8-bit bucket collision is ~6% per table BY
    DESIGN — hyperplane blocking targets truly-near pairs; recall is
    asserted on planted near-dups below.)"""
    from funnel_report_etl_pipeline__spark.operators.similarity import (
        cosine_near_dup_pairs,
        embedding_dedup_pairs_lsh,
    )

    emb = spark.read.parquet(f"{SF_MED}/embeddings.parquet")
    exact = {(r.id_a, r.id_b) for r in cosine_near_dup_pairs(emb, threshold=0.45).collect()}
    lsh = {
        (r.id_a, r.id_b)
        for r in embedding_dedup_pairs_lsh(emb, threshold=0.45).collect()
    }
    assert lsh <= exact
    assert exact, "threshold found no pairs — test data changed?"


def test_semantic_dedup_recovers_planted_clusters(spark):
    """On near-dup-structured data (in-cluster cosine ~0.97 — what a real
    semantic-dedup corpus looks like), LSH blocking + components recovers
    the planted clusters: most clusters collapse to one component."""
    from funnel_report_etl_pipeline__spark.operators.dedup import dedup_assign_clusters
    from funnel_report_etl_pipeline__spark.operators.similarity import (
        embedding_dedup_pairs_lsh,
    )

    from .test_similarity import PER_CLUSTER, _planted_rows

    emb = spark.createDataFrame(_planted_rows(), "vec_id long, embedding array<double>")
    pairs = embedding_dedup_pairs_lsh(emb, threshold=0.9).select("id_a", "id_b")
    labels = dedup_assign_clusters(emb, pairs, id_col="vec_id").collect()
    # fraction of vectors whose component equals their planted cluster's
    # global min id — i.e. the cluster was recovered whole
    whole = sum(
        1 for r in labels if r.component == (r.vec_id // PER_CLUSTER) * PER_CLUSTER
    ) / len(labels)
    assert whole >= 0.9, f"only {whole:.2%} of vectors in fully-recovered clusters"
    # and no component ever spans two planted clusters (cross-cluster
    # cosine ~0 can never pass the 0.9 verify)
    for r in labels:
        assert r.component // PER_CLUSTER == r.vec_id // PER_CLUSTER


def test_semantic_clusters_labels_consistent(spark):
    rows = SPECS["semantic_dedup_clusters"].fn(spark, SF_MED).collect()
    assert len(rows) == 500  # one row per vector, singletons included
    by_id = {r.vec_id: r for r in rows}
    for r in rows:
        assert r.component <= r.vec_id
        assert r.is_canonical == (r.component == r.vec_id)
        # the component label is itself a member of the component
        assert by_id[r.component].component == r.component
