"""End-to-end training-data pipeline CLI — the data-plane sibling of the
report-oriented ``cli.py``:

    python -m funnel_report_etl_pipeline__spark.pipeline_cli \\
        --input /root/testdata/sf0.001/documents.parquet \\
        --out /tmp/curated --shards 8

ingest (parquet or JSONL) → quality gate → PII redaction → exact dedup
[→ --span-dedup: ExactSubstr duplicated-span removal] →
content-addressed shard export + manifest (printed as one JSON line, the
artifact a training job verifies before reading).

Every stage is the already-oracle-verified operator; this module only
sequences them into one lineage — Catalyst fuses the gates into the scan,
dedup is the single wide shuffle, and the shard write re-partitions once.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_pipeline(
    spark: SparkSession,
    input_path: str,
    out_path: str,
    n_shards: int = 8,
    jsonl: bool = False,
    span_dedup: bool = False,
) -> dict:
    """Run curate → redact → dedup [→ span removal] → shard-export;
    return the manifest as a plain dict (shard → {n_rows,
    content_checksum}, plus totals)."""
    from funnel_report_etl_pipeline__spark.operators.dedup import (
        dup_span_dedup,
        exact_dedup,
    )
    from funnel_report_etl_pipeline__spark.operators.text import (
        quality_keep_expr,
        redact_pii,
    )
    from funnel_report_etl_pipeline__spark.sources.sinks import (
        read_documents_jsonl,
        write_training_shards,
    )

    if jsonl:
        raw = read_documents_jsonl(spark, input_path)
        docs: DataFrame = raw.filter(F.col("_corrupt_record").isNull()).drop(
            "_corrupt_record"
        )
    else:
        docs = spark.read.parquet(input_path)

    kept = docs.filter(quality_keep_expr("text"))
    # carry every metadata column (lang, source, ...) through redaction —
    # downstream mixture balancing needs the source labels on the shards
    meta_cols = tuple(c for c in docs.columns if c not in ("doc_id", "text"))
    red = redact_pii(kept, "text", "doc_id", keep_cols=meta_cols).withColumnRenamed(
        "redacted", "text"
    )
    deduped = exact_dedup(red, "text", "doc_id")
    if span_dedup:
        # ExactSubstr pass AFTER whole-doc dedup (the cheap gate first):
        # replace text with the span-cleaned version, drop docs emptied
        # of novel content, carry the metadata columns through
        spans = dup_span_dedup(deduped, "doc_id", "text").select(
            "doc_id", F.col("text_clean").alias("__clean")
        )
        deduped = (
            deduped.join(spans, "doc_id")
            .filter(F.col("__clean") != "")
            .drop("text")
            .withColumnRenamed("__clean", "text")
        )
    manifest_df = write_training_shards(deduped, out_path, n_shards=n_shards)
    shards = {
        int(r.shard): {"n_rows": int(r.n_rows), "content_checksum": int(r.content_checksum)}
        for r in manifest_df.collect()
    }
    return {
        "out": out_path,
        "n_shards": n_shards,
        "n_rows": sum(s["n_rows"] for s in shards.values()),
        "shards": shards,
    }


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="parquet path or JSONL file/glob")
    ap.add_argument("--out", required=True, help="output directory for shards")
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--jsonl", action="store_true", help="input is JSONL, not parquet")
    ap.add_argument(
        "--span-dedup",
        action="store_true",
        help="also remove duplicated 8-token spans (ExactSubstr dedup)",
    )
    args = ap.parse_args(argv)

    from funnel_report_etl_pipeline__spark.session import get_spark

    spark = get_spark(app_name="pipeline")
    manifest = run_pipeline(
        spark, args.input, args.out, args.shards, args.jsonl, args.span_dedup
    )
    print(json.dumps(manifest))
    return 0


if __name__ == "__main__":
    sys.exit(main())
