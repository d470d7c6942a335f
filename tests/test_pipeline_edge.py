"""Degenerate-input behavior of the pipeline operators: empty text,
single tokens, all-identical tokens. These inputs exist in any real crawl
shard; every operator must return sane rows, not crash or drop documents
silently (except where documented, e.g. bigram support needs >=2 tokens)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def weird_docs(spark):
    rows = [
        (1, ""),                          # empty text
        (2, "solo"),                      # single token
        (3, "dup dup dup dup dup dup"),   # all-identical tokens
        (4, " ".join(f"w{i}" for i in range(50))),  # normal doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").cache()
    df.count()
    yield df
    df.unpersist()


def test_chunk_dedups_keep_every_doc(spark, weird_docs):
    from funnel_report_etl_pipeline__spark.operators.dedup import (
        cdc_chunk_dedup,
        chunk_dedup,
    )

    for op in (chunk_dedup, cdc_chunk_dedup):
        rows = {r.doc_id: r for r in op(weird_docs).collect()}
        assert set(rows) == {1, 2, 3, 4}, op.__name__
        for r in rows.values():
            assert r.n_chunks >= 1 and 0 <= r.n_kept <= r.n_chunks
        # the normal doc survives intact (globally unique chunks)
        assert rows[4].text_clean == " ".join(f"w{i}" for i in range(50))
        # empty text: split('') -> [''] -> one (empty-ish) chunk, kept
        assert rows[1].n_chunks == 1


def test_winnowing_handles_short_and_empty_text(spark, weird_docs):
    from funnel_report_etl_pipeline__spark.operators.text import (
        winnow_fingerprint_set,
    )

    rows = {r.doc_id: r for r in winnow_fingerprint_set(weird_docs).collect()}
    assert set(rows) == {1, 2, 3, 4}
    for r in rows.values():
        # docs shorter than k hash the whole text -> exactly one fingerprint
        assert r.n_fps >= 1
        assert r.fp_min >= 0
    assert rows[1].n_fps == 1 and rows[2].n_fps == 1


def test_repetition_stats_degenerate_docs(spark, weird_docs):
    from funnel_report_etl_pipeline__spark.operators.text import repetition_stats

    rows = {r.doc_id: r for r in repetition_stats(weird_docs).collect()}
    assert set(rows) == {1, 2, 3, 4}
    # no 2-grams at all -> 0.0 fractions, kept (no repetition evidence)
    assert rows[2].top_2gram_frac == 0.0 and rows[2].rep_keep
    # all-identical tokens -> the single 2-gram is 100% of occurrences -> gated
    assert rows[3].top_2gram_frac == 1.0 and not rows[3].rep_keep


def test_quantize_zero_vector_guard(spark):
    """An all-zero embedding must quantize with the scale guard (scale=1),
    not divide by zero."""
    from funnel_report_etl_pipeline__spark.operators.similarity import quantize_int8

    df = spark.createDataFrame(
        [(1, [0.0] * 8), (2, [1.0, -2.0, 0.5, 0.0, 0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {r.vec_id: r for r in quantize_int8(df).collect()}
    assert rows[1].scale == 1.0 and rows[1].q_sum == 0 and rows[1].max_abs_err == 0.0
    assert rows[2].q_min == -127 and rows[2].q_max == 64  # absmax -2 -> scale 2/127


def test_dedup_pairs_on_tiny_corpus(spark, weird_docs):
    """MinHash on a corpus with no near-dups returns zero pairs without
    erroring on short/empty docs."""
    from funnel_report_etl_pipeline__spark.operators.dedup import minhash_dedup_pairs

    assert minhash_dedup_pairs(weird_docs, threshold=0.8).collect() == []


# --- round-5 operators on degenerate corpora --------------------------------


def _tmp_docs(spark, rows, schema="doc_id long, text string, lang string, source string"):
    import tempfile

    tmp = tempfile.mkdtemp()
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmp}/documents.parquet"
    )
    return tmp


def test_r5_ops_survive_degenerate_documents(spark):
    """Empty text, single token, unicode, and runs of spaces must not
    crash any round-5 document operator; row counts stay sane."""
    from funnel_report_etl_pipeline__spark.plans.registry import load_all

    specs = load_all()
    tmp = _tmp_docs(
        spark,
        [
            (1, "", "en", "src0"),
            (2, "solo", "en", "src1"),
            (3, "naïve café 北京 居酒屋 emoji 🙂 done x y z", "zh", "src2"),
            (4, "a  b   c    d", "en", "src3"),  # multi-space runs
            (5, " ".join(f"t{i}" for i in range(30)), "fr", "src0"),
        ],
    )
    for name in (
        "quality_classifier",
        "priority_source_dedup",
        "dup_ngram_coverage",
        "dup_span_removal",
        "dsir_importance",
        "mixture_epochs",
        "tfidf_topterms",
        "source_drift_l1",
        "per_source_holdout",
        "length_outliers",
        "bm25_search",
    ):
        rows = specs[name].fn(spark, tmp).collect()
        assert len(rows) <= 5 * 5, name  # bounded output, no blow-up
    # dedup keeps all 5 (no duplicates planted)
    assert len(specs["priority_source_dedup"].fn(spark, tmp).collect()) == 5
    # span removal leaves every doc whole (nothing shares an 8-gram)
    spans = {r.doc_id: r for r in specs["dup_span_removal"].fn(spark, tmp).collect()}
    assert spans[5].n_kept == spans[5].n_tokens == 30


def test_r5_event_ops_survive_single_user_single_event(spark):
    import tempfile
    from datetime import datetime

    from funnel_report_etl_pipeline__spark.plans.registry import load_all

    specs = load_all()
    tmp = tempfile.mkdtemp()
    spark.createDataFrame(
        [(1, datetime(2026, 3, 1), 7, "purchase", 5.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp}/events.parquet")

    att = specs["last_touch_attribution"].fn(spark, tmp).collect()
    assert len(att) == 1 and att[0].campaign is None and att[0].n_purchases == 1
    rfm = specs["user_rfm_segments"].fn(spark, tmp).collect()
    assert len(rfm) == 1 and rfm[0].frequency == 1
    bounce = specs["bounce_rate_daily"].fn(spark, tmp).collect()
    assert len(bounce) == 1 and bounce[0].bounce_rate == 1.0
    trans = specs["event_transition_matrix"].fn(spark, tmp).collect()
    assert trans == []  # one event -> no transitions
    paths = specs["top_session_paths"].fn(spark, tmp).collect()
    assert len(paths) == 1 and paths[0].path == "purchase"
