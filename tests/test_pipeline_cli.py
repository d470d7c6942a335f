"""End-to-end test of the data-plane CLI: ingest → curate → redact →
dedup → shard export, verified against the standalone operators."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from funnel_report_etl_pipeline__spark.pipeline_cli import run_pipeline

from .conftest import SF_SMALL


def test_pipeline_parquet_end_to_end(spark, tmp_path):
    from funnel_report_etl_pipeline__spark.operators.dedup import exact_dedup
    from funnel_report_etl_pipeline__spark.operators.text import (
        quality_keep_expr,
        redact_pii,
    )

    out = str(tmp_path / "curated")
    manifest = run_pipeline(
        spark, f"{SF_SMALL}/documents.parquet", out, n_shards=4
    )
    # manifest internally consistent and JSON-serializable
    assert set(manifest["shards"]) <= {0, 1, 2, 3}
    assert manifest["n_rows"] == sum(
        s["n_rows"] for s in manifest["shards"].values()
    )
    json.dumps(manifest)

    # written rows == the composed standalone operators on the same input
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    expected = exact_dedup(
        redact_pii(docs.filter(quality_keep_expr("text"))).withColumnRenamed(
            "redacted", "text"
        ),
        "text",
        "doc_id",
    )
    written = spark.read.parquet(out)
    assert written.count() == manifest["n_rows"] == expected.count()
    assert {r.doc_id for r in written.select("doc_id").collect()} == {
        r.doc_id for r in expected.select("doc_id").collect()
    }
    # redaction really ran before the write
    assert written.filter(F.col("text").rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+")).count() == 0
    # metadata columns survive the redaction hop — mixture balancing
    # downstream needs the source labels on the shards (round-4 review)
    assert {"lang", "source"} <= set(written.columns)
    assert written.filter(F.col("source").isNull()).count() == 0


def test_pipeline_jsonl_end_to_end(spark, tmp_path):
    src = tmp_path / "in.jsonl"
    good = "the quick brown fox jumps over the lazy dog and some more filler words"
    lines = [
        json.dumps({"doc_id": i, "text": f"{good} {i}", "lang": "en", "source": "web"})
        for i in range(20)
    ]
    lines.insert(5, "corrupt {not json")
    lines.append(json.dumps({"doc_id": 99, "text": "too short", "lang": "en", "source": "web"}))
    src.write_text("\n".join(lines) + "\n")

    out = str(tmp_path / "curated")
    manifest = run_pipeline(spark, str(src), out, n_shards=2, jsonl=True)
    # 20 good docs survive; the corrupt line and the low-quality doc don't
    assert manifest["n_rows"] == 20
    written = spark.read.parquet(out)
    assert sorted(r.doc_id for r in written.collect()) == list(range(20))
    assert {"lang", "source"} <= set(written.columns)


def test_pipeline_cli_span_dedup_removes_copied_spans(spark, tmp_path):
    """--span-dedup: a doc whose text fully duplicates an earlier doc is
    dropped from the shards; a doc with a novel prefix + copied tail
    keeps only the prefix."""
    from funnel_report_etl_pipeline__spark.pipeline_cli import run_pipeline

    # quality gate needs >=10 tokens and at least one stopword
    base = "the " + " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (1, base, "en", "src0"),
            (2, base, "en", "src1"),           # exact dup: killed by exact_dedup
            (3, "the n1 n2 n3 " + base, "en", "src2"),  # copied tail: span-cleaned
        ],
        "doc_id long, text string, lang string, source string",
    )
    src = str(tmp_path / "in.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "shards")
    manifest = run_pipeline(spark, src, out, n_shards=2, span_dedup=True)
    shards = spark.read.parquet(out)
    texts = {r.doc_id: r.text for r in shards.collect()}
    assert texts[1] == base
    assert 2 not in texts
    assert texts[3] == "the n1 n2 n3"
    assert manifest["n_rows"] == 2
