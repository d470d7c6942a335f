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
