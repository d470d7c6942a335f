from funnel_report_etl_pipeline__spark.sources.datespec import DateWindow, parse_date_spec
from funnel_report_etl_pipeline__spark.sources.readers import TestDataCatalog, read_funnel_csv
from funnel_report_etl_pipeline__spark.sources.mock import mock_funnel_frames

__all__ = [
    "DateWindow",
    "parse_date_spec",
    "TestDataCatalog",
    "read_funnel_csv",
    "mock_funnel_frames",
]
