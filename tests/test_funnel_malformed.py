"""Malformed-input robustness: the reference degraded bad cells to
empty/zero (run_sql returns an empty frame on error, report_engine.py:60-62);
under Spark 4's default ANSI mode a bare cast would instead kill the job.
These tests prove the try_cast path holds for adversarial cells."""

from __future__ import annotations

import pytest

from funnel_report_etl_pipeline__spark import schemas
from funnel_report_etl_pipeline__spark.operators.funnel import (
    discovery_totals,
    fi_status_counts,
    funnel_metrics,
    otp_totals,
    stage_totals,
)

E = "FIU_X"


@pytest.fixture(scope="module")
def hostile_frames(spark):
    """Every numeric cell class the landing zone can produce: ints, floats,
    negatives, empty strings, garbage text, None, whitespace."""
    stage_rows = [
        (E, "01-01-2026", "100", "200.9", "-5", "", "abc", None, " ", "3e2", "0", "1.5", "2"),
        (E, "01-01-2026", "NaNish", "1", "1", "1", "1", "1", "1", "1", "1", "1", "1"),
    ]
    uf = spark.createDataFrame(stage_rows, schemas.UF_STAGES_SCHEMA)
    otp = spark.createDataFrame(
        [(E, "garbage", "", None), (E, "10", "20", "30")], schemas.OTP_SUMMARY_SCHEMA
    )
    disc = spark.createDataFrame(
        [(E, "", "x", None, "5", "oops"), (E, "1", "2", "3", "", "4")],
        schemas.DISCOVERY_SUMMARY_SCHEMA,
    )
    fi = spark.createDataFrame(
        [(E, "Success"), (E, "Bogus"), (E, None), (E, "")], schemas.USER_FUNNEL_SCHEMA
    )
    return uf, otp, disc, fi


def test_malformed_cells_never_crash(spark, hostile_frames):
    uf, otp, disc, fi = hostile_frames
    m = funnel_metrics(
        stage_totals(uf, E), otp_totals(otp, E), discovery_totals(disc, E), fi_status_counts(fi, E)
    ).collect()[0].asDict()
    # garbage -> NULL -> 0; parseable cells still contribute
    assert m["d1"] == 100  # "100" + "NaNish"(->0)
    assert m["otp_wrong"] == 20  # "garbage" dropped, "20" kept
    assert m["fi_req_ok"] == 1  # one Success; Bogus/None/'' filtered
    assert all(isinstance(v, int) for v in m.values())


def test_truncation_and_scientific_notation(spark, hostile_frames):
    uf, _, _, _ = hostile_frames
    row = stage_totals(uf, E).collect()[0].asDict()
    # "200.9" truncates to 200 (+1) — cast-then-truncate per cell
    assert row["OTP_Based_Sign_in_Sign_up"] == 201
    # negative passthrough
    assert row["View_Consent_Details"] == -4
    # scientific notation parses as double then truncates: 3e2 -> 300 (+1)
    assert row[schemas.STAGE_COLUMNS[7]] == 301