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
from funnel_report_etl_pipeline__spark.operators.text import quality_keep_expr

__all__ = ["curate_documents", "curation_summary"]


def curate_documents(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """documents → quality-kept, exact-deduped corpus (original columns).

    The quality gate is a scan-side filter EXPRESSION (not a stats join —
    that would scan the corpus twice); dedup keeps the lowest id per exact
    text. At 100 TB the dedup shuffle therefore sees only surviving rows,
    and only (id, hash) pairs at that.
    """
    kept = docs.filter(quality_keep_expr(text_col))
    return exact_dedup(kept, text_col, id_col)


def curation_summary(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-source accounting of the curated corpus: surviving docs and
    token budgets (whitespace + BPE-ish) — the numbers a data-mixture
    design actually consumes.

    The token counts are row-wise projections ADDED to the curated lineage
    (not joined back — a self-join would re-run the quality filter + dedup
    window on both sides and re-shuffle by id)."""
    curated = curate_documents(docs, text_col, id_col)
    text = F.col(text_col)
    from funnel_report_etl_pipeline__spark.operators.text import TOKEN_REGEX

    return (
        curated.withColumns(
            {
                "n_ws_tokens": F.size(F.split(text, "\\s+")).cast("long"),
                "n_bpe_tokens": F.size(
                    F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0)
                ).cast("long"),
            }
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_ws_tokens").alias("total_ws_tokens"),
            F.sum("n_bpe_tokens").alias("total_bpe_tokens"),
        )
    )
