"""Engine-native sinks: partitioned parquet for the data plane.

The reference's data plane is directory-per-day CSV behind Drill
(docs/DATA_SOURCES.md:7-19). The 100 TB posture is a one-time conversion to
columnar parquet partitioned by (event_date[, entity bucket]) so every
windowed read becomes partition pruning instead of path construction —
these helpers are that conversion plus the general partitioned writer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from funnel_report_etl_pipeline__spark.sources.datespec import DateWindow
from funnel_report_etl_pipeline__spark.sources.readers import read_funnel_csv


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    target_file_rows: int | None = None,
) -> None:
    """Partitioned parquet writer.

    ``target_file_rows`` caps rows per output file (maxRecordsPerFile) so a
    skewed partition still produces splittable, row-group-sized files —
    the property the local testdata lacks (PLANS.md caveats)."""
    w = df.write.mode(mode)
    if target_file_rows:
        w = w.option("maxRecordsPerFile", target_file_rows)
    w.partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (and optionally sorted) table — the shuffle-free-join
    layout. Two fact tables bucketed on the same key with the same bucket
    count join WITHOUT an exchange (verified by plan assertion in
    tests/test_bucketing.py); at 100 TB that deletes the two largest
    shuffles in the workload. Sorting within buckets additionally removes
    the sort for sort-merge joins."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def convert_landing_zone(
    spark: SparkSession,
    base: str,
    dataset: str,
    window: DateWindow,
    schema: T.StructType,
    out_path: str,
    target_file_rows: int | None = None,
) -> DataFrame:
    """One-time CSV landing zone → date-partitioned parquet conversion.

    ONE multi-path scan (never a per-day loop — that is the reference's
    N+1 anti-pattern); the typed ``event_date`` partition column is derived
    from each row's source path via ``input_file_name()``. After this,
    every reader is a pruned columnar scan and the per-day CSV path logic
    is dead."""
    df = read_funnel_csv(spark, base, dataset, window, schema)
    stamped = df.withColumn(
        "event_date",
        F.to_date(
            F.regexp_extract(F.input_file_name(), r"(\d{2}_\d{2}_\d{4})", 1),
            "dd_MM_yyyy",
        ),
    )
    write_partitioned(stamped, out_path, ["event_date"], target_file_rows=target_file_rows)
    return spark.read.parquet(out_path)
