"""Tied-timestamp regression for the event-grain funnels: an event with ts
EQUAL to the previous stage's must not advance the chain (strict-after,
matching the oracle's `e.ts > t_prev`)."""

from __future__ import annotations

from datetime import datetime

import duckdb
import pytest

from funnel_report_etl_pipeline__spark.plans.registry import load_all


@pytest.fixture(scope="module")
def tied_sf_dir(spark, tmp_path_factory):
    """A tiny events table with planted ties, laid out like a testdata dir."""
    d = tmp_path_factory.mktemp("tied_sf")
    t = datetime(2026, 1, 1, 12, 0, 0)
    later = datetime(2026, 1, 1, 13, 0, 0)
    rows = [
        # user 1: signup and view at the SAME instant → depth stays 1
        (1, 1, "signup", t, 1.0),
        (2, 1, "view", t, 1.0),
        # user 2: properly ordered → depth 2
        (3, 2, "signup", t, 1.0),
        (4, 2, "view", later, 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize("qname", ["event_funnel_users", "event_funnel_windowed"])
def test_tied_ts_does_not_advance(spark, tied_sf_dir, qname):
    spec = load_all()[qname]
    srow = spec.fn(spark, tied_sf_dir).collect()[0].asDict()
    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; DuckDB needs the part-file glob
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tied_sf_dir}/events.parquet/*.parquet'"
    )
    orow = con.execute(spec.oracle).df().iloc[0].to_dict()
    con.close()
    assert {k: int(v) for k, v in srow.items()} == {k: int(v) for k, v in orow.items()}
    # and the semantics themselves: 2 signups, only user 2 reaches stage 2
    assert int(srow[list(srow)[0]]) == 2
    assert int(srow[list(srow)[1]]) == 1