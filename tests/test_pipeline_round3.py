"""Semantic unit tests for the round-3 operators: chunk-level dedup,
PII redaction, and int8 embedding quantization (planted inputs, exact
expectations — the registry parity test covers the corpus-wide oracles)."""

from __future__ import annotations

import pytest

from funnel_report_etl_pipeline__spark.operators.dedup import chunk_dedup
from funnel_report_etl_pipeline__spark.operators.similarity import quantize_int8
from funnel_report_etl_pipeline__spark.operators.text import redact_pii

BOILER = "w0 w1 w2 w3 w4 w5 w6 w7"  # exactly one 8-token chunk


def test_chunk_dedup_drops_repeated_boilerplate(spark):
    docs = spark.createDataFrame(
        [
            (1, BOILER + " tail1 tail2"),
            (2, BOILER + " unique2 xx yy"),  # chunk 0 repeats doc 1's chunk 0
            (3, "all fresh tokens here nothing shared at all"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in chunk_dedup(docs, chunk_tokens=8).collect()}
    assert out[1].n_chunks == 2 and out[1].n_kept == 2
    assert out[1].text_clean == BOILER + " tail1 tail2"
    # doc 2 loses its boilerplate chunk but keeps its unique tail
    assert out[2].n_chunks == 2 and out[2].n_kept == 1
    assert out[2].text_clean == "unique2 xx yy"
    assert out[3].n_kept == out[3].n_chunks == 1


def test_chunk_dedup_fully_duplicate_doc_becomes_empty(spark):
    docs = spark.createDataFrame(
        [(1, BOILER), (2, BOILER)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in chunk_dedup(docs, chunk_tokens=8).collect()}
    assert out[1].text_clean == BOILER
    assert out[2].n_kept == 0 and out[2].text_clean == ""


def test_chunk_dedup_alignment_matters(spark):
    # the same 8 tokens at a different offset form a DIFFERENT chunk —
    # chunk dedup is positional-window exact-match, not substring search
    docs = spark.createDataFrame(
        [(1, BOILER), (2, "shift " + BOILER)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in chunk_dedup(docs, chunk_tokens=8).collect()}
    assert out[2].n_kept == out[2].n_chunks == 2


def test_redact_pii_counts_and_replaces(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith@corp.io and alice@x.dev ip 192.168.0.1 ok"),
            (2, "call +49-555-0199 or +1-800-555-0100 nothing else"),
            (3, "clean text with no pii at all"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    assert (out[1].n_email, out[1].n_ipv4, out[1].n_phone) == (2, 1, 0)
    assert out[1].redacted == "mail <EMAIL> and <EMAIL> ip <IP> ok"
    assert (out[2].n_email, out[2].n_ipv4, out[2].n_phone) == (0, 0, 2)
    assert out[2].redacted == "call <PHONE> or <PHONE> nothing else"
    assert out[3].redacted == "clean text with no pii at all"


def test_quantize_int8_bounds_and_reconstruction(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, -0.5, 0.25, 0.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),  # zero vector: guard must not divide by 0
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r.vec_id: r for r in quantize_int8(df).collect()}
    r1 = out[1]
    assert r1.scale == pytest.approx(1.0 / 127.0)
    assert -127 <= r1.q_min <= r1.q_max <= 127
    assert r1.q_max == 127  # max|x| always hits ±127 exactly
    # reconstruction error of round-to-nearest is at most scale/2
    assert r1.max_abs_err <= r1.scale / 2 + 1e-12
    r2 = out[2]
    assert (r2.scale, r2.q_sum, r2.q_min, r2.q_max, r2.max_abs_err) == (1.0, 0, 0, 0, 0.0)


def test_novelty_scores_planted(spark):
    from funnel_report_etl_pipeline__spark.operators.text import novelty_scores

    a = "a1 a2 a3 a4 a5 a6"          # 2 distinct 5-grams, all first here
    docs = spark.createDataFrame(
        [
            (1, a),
            (2, a),                   # verbatim copy → novelty 0
            (3, "b1 b2 b3 b4 b5 " + a),  # own grams + doc 1's two grams
            (4, "too short"),         # < 5 tokens → no output row
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in novelty_scores(docs, ngram=5).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].n_grams == 2 and out[1].novelty == 1.0
    assert out[2].n_grams == 2 and out[2].n_novel == 0 and out[2].novelty == 0.0
    # doc 3: 7 distinct grams; doc 1's two grams are not novel here
    assert out[3].n_grams == 7 and out[3].n_novel == 5
    assert out[3].novelty == pytest.approx(5 / 7)
