from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="session")
def spark():
    from funnel_report_etl_pipeline__spark.session import get_spark

    s = get_spark(app_name="tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'")
    yield con
    con.close()


def pytest_collection_modifyitems(config, items):
    """Scale-marked probes need a 16 g driver heap (PYSPARK_SUBMIT_ARGS)
    and minutes of wall time; they run only when explicitly selected
    (``-m scale`` / ``-m "scale or ..."``) or RUN_SCALE_TESTS=1, so a
    plain ``pytest tests/`` stays green on a default-heap JVM."""
    import os

    if "scale" in (config.option.markexpr or "") or os.environ.get("RUN_SCALE_TESTS"):
        return
    skip = pytest.mark.skip(reason="scale probe: opt in with -m scale or RUN_SCALE_TESTS=1")
    for item in items:
        if "scale" in item.keywords:
            item.add_marker(skip)
