from funnel_report_etl_pipeline__spark.functions.core import (
    dsum,
    nullif_empty,
    pct_of,
    sum_cast_double,
    trunc_long,
)

__all__ = ["dsum", "nullif_empty", "pct_of", "sum_cast_double", "trunc_long"]
