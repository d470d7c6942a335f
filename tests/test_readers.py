"""CSV source layer: exact-day path scan vs month-glob + Date refine (D2)."""

from __future__ import annotations

import csv

import pytest

from funnel_report_etl_pipeline__spark import schemas
from funnel_report_etl_pipeline__spark.sources.datespec import parse_date_spec
from funnel_report_etl_pipeline__spark.sources.readers import read_funnel_csv

STEM = "uf-stages-user-funnel"


@pytest.fixture()
def month_layout(tmp_path):
    """Day dirs across two months; each file holds one row whose Date
    matches the dir."""
    days = ["28_01_2026", "29_01_2026", "01_02_2026", "02_02_2026", "15_02_2026"]
    for d in days:
        day = tmp_path / d
        day.mkdir()
        with open(day / f"{STEM}-{d}.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["Entity_ID", "Date"] + schemas.STAGE_COLUMNS)
            w.writerow(["FIU_001", d.replace("_", "-"), *["1"] * 11])
    return tmp_path


def _dates(df):
    return sorted(r.Date for r in df.select("Date").collect())


def test_exact_day_paths(spark, month_layout):
    w = parse_date_spec("29_01_2026 -> 01_02_2026")
    df = read_funnel_csv(spark, str(month_layout), "uf_stages", w, schemas.UF_STAGES_SCHEMA)
    assert _dates(df) == ["01-02-2026", "29-01-2026"]


def test_month_glob_refines_overread(spark, month_layout):
    """The glob scans both whole months (5 files) but the Date mask must
    cut it back to the exact window — reference report_engine.py:96-107."""
    w = parse_date_spec("29_01_2026 -> 02_02_2026")
    df = read_funnel_csv(
        spark, str(month_layout), "uf_stages", w, schemas.UF_STAGES_SCHEMA, month_glob=True
    )
    assert _dates(df) == ["01-02-2026", "02-02-2026", "29-01-2026"]


def test_month_glob_agrees_with_day_paths(spark, month_layout):
    w = parse_date_spec("28_01_2026 -> 15_02_2026")
    a = read_funnel_csv(spark, str(month_layout), "uf_stages", w, schemas.UF_STAGES_SCHEMA)
    b = read_funnel_csv(
        spark, str(month_layout), "uf_stages", w, schemas.UF_STAGES_SCHEMA, month_glob=True
    )
    assert _dates(a) == _dates(b)


def test_month_glob_partial_window_keeps_existing_months(spark, month_layout):
    """Window spans a month with NO directory at all: the populated months'
    data must survive (regression: an unmatched glob used to raise
    PATH_NOT_FOUND and the catch-all returned an empty frame)."""
    w = parse_date_spec("28_01_2026 -> 15_03_2026")  # no March dir exists
    df = read_funnel_csv(
        spark, str(month_layout), "uf_stages", w, schemas.UF_STAGES_SCHEMA, month_glob=True
    )
    assert len(_dates(df)) == 5  # all five planted days, none dropped


def test_month_glob_malformed_date_cell_drops_row(spark, month_layout, tmp_path):
    """A garbage Date cell must drop that row (try_to_date), not kill the
    job under ANSI mode."""
    import csv as _csv

    day = month_layout / "16_02_2026"
    day.mkdir()
    with open(day / f"{STEM}-16_02_2026.csv", "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["Entity_ID", "Date"] + schemas.STAGE_COLUMNS)
        w.writerow(["FIU_001", "not-a-date", *["1"] * 11])
        w.writerow(["FIU_001", "16-02-2026", *["1"] * 11])
    w = parse_date_spec("16_02_2026 -> 16_02_2026")
    df = read_funnel_csv(
        spark, str(month_layout), "uf_stages", w, schemas.UF_STAGES_SCHEMA, month_glob=True
    )
    assert _dates(df) == ["16-02-2026"]


def test_missing_days_return_empty(spark, month_layout):
    w = parse_date_spec("01_06_2026 -> 02_06_2026")
    df = read_funnel_csv(spark, str(month_layout), "uf_stages", w, schemas.UF_STAGES_SCHEMA)
    assert df.count() == 0
    assert df.schema == schemas.UF_STAGES_SCHEMA


def test_metadata_column_stats_footer_only(spark):
    """COUNT/MIN/MAX served from parquet footers (PushedAggregation) —
    the helper itself asserts the pushdown engaged; here we check the
    values against a real scan and that session confs are restored."""
    from pyspark.sql import functions as F

    from funnel_report_etl_pipeline__spark.sources.readers import (
        metadata_column_stats,
    )

    path = "/root/testdata/sf0.01/orders.parquet"
    out = metadata_column_stats(spark, path, "o_orderkey").collect()[0]
    real = spark.read.parquet(path).agg(
        F.count(F.lit(1)), F.min("o_orderkey"), F.max("o_orderkey")
    ).collect()[0]
    assert (out.n_rows, out.min_val, out.max_val) == tuple(real)
    # confs restored: the default v1 path must still plan WITHOUT pushdown
    p = (
        spark.read.parquet(path)
        .agg(F.count(F.lit(1)))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedAggregation" not in p
