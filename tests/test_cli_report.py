"""End-to-end pipeline tests: demo + production CSV landing zone → reports
(reference run_reports.py user journey)."""

from __future__ import annotations

import csv
import json

import pytest

from funnel_report_etl_pipeline__spark import schemas
from funnel_report_etl_pipeline__spark.cli import run
from funnel_report_etl_pipeline__spark.config import EngineConfig
from funnel_report_etl_pipeline__spark.report import (
    html_to_plain,
    presentation_table,
    safe_filename,
    send_report_mail,
)

STEMS = {
    "uf_stages": "uf-stages-user-funnel",
    "otp_summary": "otp-summary-user-funnel",
    "discovery_summary": "discovery-summary-user-funnel",
    "user_funnel": "user-funnel",
}


def test_demo_writes_golden_presentation(spark, tmp_path):
    cfg = EngineConfig(output_dir=str(tmp_path))
    written = run(spark, demo=True, date_spec="15_02_2026", cfg=cfg)
    assert len(written) == 1
    with open(written[0]) as f:
        rows = list(csv.reader(f))
    assert len(rows) == 25  # U2 spacer + 24 layout rows
    assert rows[2][1] == "16.2"  # approved pct
    assert rows[3][1] == "10.6"  # shared pct
    assert rows[7][2] == "7700" and rows[7][5] == "0"
    assert rows[12][5] == "-150"  # negative otp_ok_drop passthrough
    assert rows[21][5] == "" and rows[21][6] == ""  # 'no action' blanks


@pytest.fixture()
def landing(tmp_path):
    base = tmp_path / "landing"
    for d in ("14_02_2026", "15_02_2026"):
        day = base / d
        day.mkdir(parents=True)
        with open(day / f"{STEMS['uf_stages']}-{d}.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["Entity_ID", "Date"] + schemas.STAGE_COLUMNS)
            w.writerow(["FIU_001", d.replace("_", "-"), *["100"] * 11])
        with open(day / f"{STEMS['otp_summary']}-{d}.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["entity_id"] + schemas.OTP_COLUMNS)
            w.writerow(["FIU_001", "10", "20", "30"])
        with open(day / f"{STEMS['discovery_summary']}-{d}.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["entity_id"] + schemas.DISCOVERY_COLUMNS)
            w.writerow(["FIU_001", "10", "20", "", "5", "5"])
        with open(day / f"{STEMS['user_funnel']}-{d}.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["entity_id", "fetch_status"])
            for _ in range(30):
                w.writerow(["FIU_001", "Success"])
    rec = tmp_path / "recipients.json"
    rec.write_text(
        json.dumps(
            {
                "to": {"FIU_001": ["a@x.com"], "FIU_MISSING": ["c@x.com"]},
                "cc": {"default": ["cc@x.com"]},
            }
        )
    )
    return base, rec


def test_production_range_run(spark, tmp_path, landing):
    base, rec = landing
    cfg = EngineConfig(data_base_path=str(base), output_dir=str(tmp_path / "out"))
    written = run(
        spark,
        demo=False,
        date_spec="14_02_2026 -> 15_02_2026",
        cfg=cfg,
        recipients_path=str(rec),
    )
    assert len(written) == 1  # FIU_MISSING has no data → skipped, no crash
    with open(written[0]) as f:
        rows = list(csv.reader(f))
    # 11 stage cols × 100 × 2 days; total_users = 7 cols × 200 = 1400
    assert rows[7][2] == "1400"
    # grouped counts flowed through: fi_req_ok = 60 Success + 0 Failed
    assert rows[23][2] == "60"


def test_single_day_equals_degenerate_range(spark, tmp_path, landing):
    base, rec = landing
    cfg = EngineConfig(data_base_path=str(base), output_dir=str(tmp_path / "o1"))
    w1 = run(spark, date_spec="14_02_2026", cfg=cfg, recipients_path=str(rec))
    cfg2 = EngineConfig(data_base_path=str(base), output_dir=str(tmp_path / "o2"))
    w2 = run(
        spark, date_spec="14_02_2026 -> 14_02_2026", cfg=cfg2, recipients_path=str(rec)
    )
    assert open(w1[0]).read() == open(w2[0]).read()


def test_safe_filename():
    assert (
        safe_filename("fiu@bank", "01_01_2026 -> 05_01_2026")
        == "fiu-bank-01_01_2026-05_01_2026.xlsx"
    )


def test_html_to_plain():
    assert html_to_plain("a<br><b>hey</b>") == "a\nhey"


def test_mail_skips_unconfigured():
    assert send_report_mail(["a@x.com"], "s", "b") is False


def test_presentation_matches_reference_layout_shape():
    m = dict.fromkeys(
        "total_users d1 auth_drop otp_wrong otp_miss otp_ok_drop d3 no_rec fip_fail "
        "some_fail found_not_linked d4 rej appr fip_rej fip_ok fi_req_ok not_attempted "
        "fetch_ok fi_fetch_drop n_consent n_after_init n_after_auth n_after_disc "
        "n_after_link".split(),
        0,
    )
    t = presentation_table(m)
    assert len(t) == 24 and all(len(r) == 7 for r in t)
    assert t[5][0] == "Stage"
    # zero total → all pcts 0 (zero-guard), no ZeroDivisionError
    assert t[6][3] == 0
