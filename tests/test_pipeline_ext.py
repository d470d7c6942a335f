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


def test_temperature_sample_sits_between_balanced_and_natural(spark):
    """α=0.5 keeps the smallest source whole (rate 1), and every larger
    source keeps at least as much as the α=0 balanced sampler and at most
    everything — the flattening is monotone in temperature."""
    d = spark.read.parquet(f"{SF_MED}/documents.parquet")
    totals = {r.source: r.n for r in d.groupBy("source").agg(F.count("*").alias("n")).collect()}
    min_src = min(totals, key=totals.get)
    bal = SPECS["balanced_source_sample"].fn(spark, SF_MED).collect()
    temp = SPECS["temperature_source_sample"].fn(spark, SF_MED).collect()

    def by_src(rows):
        out: dict[str, int] = {}
        for r in rows:
            out[r.source] = out.get(r.source, 0) + 1
        return out

    b, t = by_src(bal), by_src(temp)
    assert t.get(min_src, 0) == totals[min_src]  # rate 1 for the smallest
    for src, n in totals.items():
        assert b.get(src, 0) <= t.get(src, 0) <= n
    # the md5 keep decision is per-doc: the balanced keep set is a subset
    # of the temperature keep set (same hash, higher threshold)
    assert {r.doc_id for r in bal} <= {r.doc_id for r in temp}


def test_cdc_chunking_is_shift_robust(spark):
    """The CDC selling point: a passage shared at DIFFERENT token offsets
    still deduplicates, because boundaries depend on content, not
    position. Fixed-width chunking (chunk_dedup) misses this by design."""
    from funnel_report_etl_pipeline__spark.operators.dedup import (
        cdc_chunk_dedup,
        chunk_dedup,
    )

    passage = " ".join(f"w{i}" for i in range(400))
    docs = spark.createDataFrame(
        [(1, passage), (2, "off1 off2 off3 " + passage)],
        "doc_id long, text string",
    )
    cdc = {r.doc_id: r for r in cdc_chunk_dedup(docs).collect()}
    # doc 2's copy of the passage chunks identically past the first
    # boundary, so most of its chunks are dropped as repeats
    assert cdc[2].n_kept < cdc[2].n_chunks
    assert cdc[2].n_kept <= cdc[2].n_chunks // 2
    # fixed-width chunking sees every doc-2 chunk as novel (offset by 3)
    fixed = {r.doc_id: r for r in chunk_dedup(docs).collect()}
    assert fixed[2].n_kept == fixed[2].n_chunks
    # and doc 1 (first occurrence, no internal repeats) keeps everything
    # under both schemes — reassembly is the identity on it
    assert cdc[1].n_kept == cdc[1].n_chunks
    assert cdc[1].text_clean == passage


def test_retention_cohort_week_zero_is_total(spark):
    """Offset 0 retains 100% of every cohort by construction (a user is
    active in their own first week), n_active never exceeds cohort_size,
    and offsets are non-negative."""
    rows = SPECS["retention_cohorts"].fn(spark, SF_MED).collect()
    assert rows
    for r in rows:
        assert r.week_offset >= 0
        assert 0 < r.n_active <= r.cohort_size
        if r.week_offset == 0:
            assert r.n_active == r.cohort_size and r.retention_pct == 100.0


def test_curation_funnel_is_monotone_waterfall(spark):
    """Every gate only drops documents (staged counts weakly decrease —
    the defining funnel invariant), and the survivor pct matches Python's
    HALF_EVEN rounding exactly as the reference's _pct does."""
    r = SPECS["curation_funnel"].fn(spark, SF_MED).collect()[0]
    stages = [r.n_total, r.n_after_holdout, r.n_quality, r.n_repetition,
              r.n_clean, r.n_canonical]
    assert all(a >= b for a, b in zip(stages, stages[1:])), stages
    assert r.n_total == 500 and r.n_canonical > 0
    assert r.pct_survived == round(r.n_canonical / r.n_total * 100, 1)


def test_winnowing_guarantee_shared_run_shares_fingerprint(spark):
    """The SIGMOD'03 winnowing guarantee: documents sharing a run of at
    least k + window - 1 = 23 chars share at least one fingerprint, while
    unrelated documents (here: disjoint alphabets) share none."""
    from funnel_report_etl_pipeline__spark.operators.text import winnow_fingerprint_set

    shared = "the quick brown fox jumps over the lazy dog"  # 44 chars
    docs = spark.createDataFrame(
        [
            (1, "AAAA " + shared + " BBBB"),
            (2, "cccc dddd " + shared),
            (3, "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss"),
        ],
        "doc_id long, text string",
    )
    # recover the actual fingerprint sets (not just the checksums)
    from pyspark.sql import Window as W
    from pyspark.sql import functions as SF

    k, window = 16, 8
    pos = docs.select(
        "doc_id",
        SF.col("text").alias("__t"),
        SF.explode(
            SF.sequence(SF.lit(1), SF.greatest(SF.length("text") - k + 1, SF.lit(1)))
        ).alias("__p"),
    )
    h = SF.conv(
        SF.substring(SF.md5(SF.col("__t").substr(SF.col("__p"), SF.lit(k))), 1, 8), 16, 10
    ).cast("long")
    fps = (
        pos.select("doc_id", h.alias("__h"), "__p")
        .withColumn(
            "fp", SF.min("__h").over(W.partitionBy("doc_id").orderBy("__p").rowsBetween(0, window - 1))
        )
        .select("doc_id", "fp")
        .distinct()
        .collect()
    )
    sets: dict[int, set] = {}
    for r in fps:
        sets.setdefault(r.doc_id, set()).add(r.fp)
    assert sets[1] & sets[2], "shared 44-char run must share a fingerprint"
    assert not (sets[1] & sets[3]) and not (sets[2] & sets[3])
    # and the summary op agrees with the recovered sets
    summary = {r.doc_id: r for r in winnow_fingerprint_set(docs).collect()}
    for did, s in sets.items():
        assert summary[did].n_fps == len(s)
        assert summary[did].fp_checksum == sum(s)


def test_winnow_containment_pairs_find_planted_passage(spark):
    """Docs sharing a long passage at different offsets pair up; docs with
    disjoint content do not; the stop-fingerprint cap removes corpus-wide
    boilerplate from the pairing signal."""
    from funnel_report_etl_pipeline__spark.operators.text import (
        winnow_containment_pairs,
    )

    passage = " ".join(f"tok{i}" for i in range(60))
    rows = [
        (1, "alpha beta " + passage),
        (2, passage + " gamma delta"),
        (3, "completely unrelated words " + " ".join(f"z{i}" for i in range(40))),
    ]
    # corpus-wide boilerplate shared by EVERY doc — must be capped away
    boiler = " ".join(f"b{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(i, t + " " + boiler) for i, t in rows], "doc_id long, text string"
    )
    pairs = {
        (r.id_a, r.id_b): r.n_shared_fps
        for r in winnow_containment_pairs(docs, max_fp_freq=2).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    # doc 3 shares only the capped boilerplate → no pair involving it
    assert not any(3 in p for p in pairs)


def test_semantic_clusters_labels_consistent(spark):
    rows = SPECS["semantic_dedup_clusters"].fn(spark, SF_MED).collect()
    assert len(rows) == 500  # one row per vector, singletons included
    by_id = {r.vec_id: r for r in rows}
    for r in rows:
        assert r.component <= r.vec_id
        assert r.is_canonical == (r.component == r.vec_id)
        # the component label is itself a member of the component
        assert by_id[r.component].component == r.component
