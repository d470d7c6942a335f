"""SQL front-end + reader fault-tolerance."""

from __future__ import annotations

import csv

import pytest

from funnel_report_etl_pipeline__spark import schemas
from funnel_report_etl_pipeline__spark.sources.datespec import parse_date_spec
from funnel_report_etl_pipeline__spark.sources.readers import TestDataCatalog, read_funnel_csv

from .conftest import SF_SMALL


def test_spark_sql_over_catalog_views(spark):
    """TestDataCatalog registers temp views: the SQL front-end and the
    DataFrame API are the same engine surface."""
    cat = TestDataCatalog(spark, SF_SMALL)
    cat.table("events")  # registers the view
    sql_rows = {
        (r.event_type, r.cnt)
        for r in spark.sql(
            "SELECT event_type, COUNT(event_type) AS cnt FROM events "
            "WHERE event_type IS NOT NULL AND event_type <> '' GROUP BY event_type"
        ).collect()
    }
    from pyspark.sql import functions as F

    df_rows = {
        (r.event_type, r.cnt)
        for r in cat.table("events")
        .filter(F.col("event_type").isNotNull() & (F.col("event_type") != ""))
        .groupBy("event_type")
        .agg(F.count("event_type").alias("cnt"))
        .collect()
    }
    assert sql_rows == df_rows and sql_rows


@pytest.fixture()
def malformed_landing(tmp_path):
    d = "15_02_2026"
    day = tmp_path / d
    day.mkdir()
    with open(day / f"uf-stages-user-funnel-{d}.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["Entity_ID", "Date"] + schemas.STAGE_COLUMNS)
        w.writerow(["FIU_001", "15-02-2026", *["1"] * 11])
        w.writerow(["FIU_BAD", "15-02-2026", "only-three-cols"])  # short row
    return str(tmp_path)


def test_permissive_mode_keeps_good_rows(spark, malformed_landing):
    w = parse_date_spec("15_02_2026")
    df = read_funnel_csv(
        spark, malformed_landing, "uf_stages", w, schemas.UF_STAGES_SCHEMA
    )
    rows = df.collect()
    # both rows surface; the short row's missing cells are NULL, and the
    # aggregate path coalesces them to 0 (reference degrade-to-zero)
    assert len(rows) == 2
    bad = next(r for r in rows if r.Entity_ID == "FIU_BAD")
    assert bad.Linking is None


def test_strict_mode_raises(spark, malformed_landing):
    w = parse_date_spec("15_02_2026")
    df = read_funnel_csv(
        spark, malformed_landing, "uf_stages", w, schemas.UF_STAGES_SCHEMA, strict=True
    )
    with pytest.raises(Exception) as ei:
        df.collect()
    assert "Malformed" in str(ei.value) or "FAILFAST" in str(ei.value)


def test_sql_view_queries_survive_sf_switch(spark):
    """Regression: the catalog registers temp views on first access per
    (session, sf_dir); spark.sql-based queries must re-register so a
    cached catalog never leaves the global view pointing at another
    sf_dir's parquet."""
    from funnel_report_etl_pipeline__spark.plans.registry import load_all

    from .conftest import SF_MED, SF_SMALL

    fn = load_all()["sql_correlated_subquery"].fn
    small_1 = {r.c_custkey: r.n_orders for r in fn(spark, SF_SMALL).collect()}
    med = {r.c_custkey: r.n_orders for r in fn(spark, SF_MED).collect()}
    small_2 = {r.c_custkey: r.n_orders for r in fn(spark, SF_SMALL).collect()}
    assert small_1 == small_2  # sf0.001 answers unchanged after sf0.01 ran
    assert small_1 != med  # and the two SFs genuinely differ
