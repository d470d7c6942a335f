"""funnel_report_etl_pipeline__spark — PySpark-native funnel analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference pipeline ``pradeep9090/Funnel-Report-ETL-Pipeline-`` (pandas +
Apache Drill REST), plus the large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) that a
100 TB deployment needs.

Design notes
------------
* Everything is declared through the DataFrame / Spark SQL API so Catalyst
  performs predicate pushdown, column pruning, partition pruning and
  partial→final aggregation (the reference did all of these by hand-built
  SQL strings and client-side pandas re-aggregation; see SURVEY.md §4).
* No Python UDFs on the parity hot path — all reference semantics are
  expressible with built-in, codegen'd expressions.
* Pandas UDFs / ``mapInPandas`` appear only in the multimodal column
  operators where per-cell binary decoding is inherently Python-side.
"""

from funnel_report_etl_pipeline__spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
