"""Structured Streaming extension (SURVEY.md §2.7/§7).

The reference is batch-only: daily directories are manual tumbling
day-windows materialized upstream (docs/DATA_SOURCES.md:5-17). This package
makes that window first-class: the same rollup/sessionization/funnel
semantics over an unbounded stream with watermarks for late data.
"""

from funnel_report_etl_pipeline__spark.streaming.funnel_stream import (
    curation_gate_stream,
    daily_rollup_stream,
    sliding_rollup_stream,
    dedup_stream,
    enrich_stream,
    funnel_depth_stream,
    read_document_stream,
    read_event_stream,
    run_to_memory,
    session_stream,
    view_purchase_attribution,
)

__all__ = [
    "read_event_stream",
    "read_document_stream",
    "daily_rollup_stream",
    "sliding_rollup_stream",
    "curation_gate_stream",
    "dedup_stream",
    "enrich_stream",
    "session_stream",
    "funnel_depth_stream",
    "view_purchase_attribution",
    "run_to_memory",
]
