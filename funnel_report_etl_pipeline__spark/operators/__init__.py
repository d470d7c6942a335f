from funnel_report_etl_pipeline__spark.operators.funnel import (
    build_funnel_report,
    discovery_totals,
    entity_funnel_metrics,
    fi_status_counts,
    funnel_metrics,
    funnel_summary,
    otp_totals,
    stage_totals,
)

__all__ = [
    "build_funnel_report",
    "discovery_totals",
    "entity_funnel_metrics",
    "fi_status_counts",
    "funnel_metrics",
    "funnel_summary",
    "otp_totals",
    "stage_totals",
]
