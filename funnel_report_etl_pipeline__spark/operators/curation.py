"""Corpus curation: the end-to-end training-data pipeline composition.

Chains the individually-verified operators — quality scoring → filter →
exact dedup → token accounting — into the curate-a-corpus flow an LLM data
pipeline actually runs. Everything stays one DataFrame lineage: Catalyst
fuses the quality projection into the scan, the dedup is the only wide
shuffle, and token counting rides the dedup output without re-scanning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from funnel_report_etl_pipeline__spark.operators.dedup import exact_dedup
from funnel_report_etl_pipeline__spark.operators.text import text_stats, token_count_regex

__all__ = ["curate_documents", "curation_summary"]


def curate_documents(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """documents → quality-kept, exact-deduped corpus (original columns).

    Quality gate = text_stats' Gopher/C4-style keep flag; dedup keeps the
    lowest id per exact text. At 100 TB: the quality filter runs scan-side
    (cheap columns only), so the dedup shuffle sees only surviving rows.
    """
    keep_ids = (
        text_stats(docs, text_col, id_col)
        .filter(F.col("quality_keep"))
        .select(id_col)
    )
    kept = docs.join(keep_ids, id_col)
    return exact_dedup(kept, text_col, id_col)


def curation_summary(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-source accounting of the curated corpus: surviving docs and
    token budgets (whitespace + BPE-ish) — the numbers a data-mixture
    design actually consumes."""
    curated = curate_documents(docs, text_col, id_col)
    toks = token_count_regex(curated, text_col, id_col)
    return (
        curated.join(toks, id_col)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_ws_tokens").alias("total_ws_tokens"),
            F.sum("n_bpe_tokens").alias("total_bpe_tokens"),
        )
    )
