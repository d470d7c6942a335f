"""End-to-end funnel probe: the full reference user journey (landing-zone
CSVs → one grouped Spark job → per-entity xlsx reports) at probe scale.

Synthesizes a multi-entity 90-day landing zone (the reference's production
shape: one directory per day, four CSV files per day, rows for every
entity — reference run_reports.py:212-243 would issue ~3 queries x 90 days
x N entities ≈ 270N sequential HTTP Drill queries for this window) and
times ONE `cli.run` over the whole range. The engine reads each of the 4
sources as a single multi-path scan + one grouped aggregation for all
entities at once, so cost is one job regardless of entity count.

Usage: python tools/e2e_funnel_probe.py [n_entities] [n_days] [rows_per_day]
       (default: 20 entities x 90 days x 500 user_funnel rows/entity/day)
Prints one JSON line.
"""

from __future__ import annotations

import csv
import json
import os
import sys
import tempfile
import time
from datetime import date, timedelta

sys.path.insert(0, ".")

STEMS = {
    "uf_stages": "uf-stages-user-funnel",
    "otp_summary": "otp-summary-user-funnel",
    "discovery_summary": "discovery-summary-user-funnel",
    "user_funnel": "user-funnel",
}
START = date(2026, 1, 1)


def synth_landing_zone(
    base: str, n_entities: int, n_days: int, uf_rows: int
) -> tuple[str, str]:
    """Write the landing zone + recipients.json; returns (zone, date_spec)."""
    from funnel_report_etl_pipeline__spark import schemas

    entities = [f"FIU_{i:03d}" for i in range(n_entities)]
    days = [START + timedelta(days=i) for i in range(n_days)]
    for d in days:
        tag = d.strftime("%d_%m_%Y")
        day_dir = os.path.join(base, tag)
        os.makedirs(day_dir, exist_ok=True)
        with open(
            os.path.join(day_dir, f"{STEMS['uf_stages']}-{tag}.csv"), "w", newline=""
        ) as f:
            w = csv.writer(f)
            w.writerow(["Entity_ID", "Date"] + schemas.STAGE_COLUMNS)
            for j, e in enumerate(entities):
                w.writerow([e, d.strftime("%d-%m-%Y"), *[str(10 + j)] * 11])
        with open(
            os.path.join(day_dir, f"{STEMS['otp_summary']}-{tag}.csv"), "w", newline=""
        ) as f:
            w = csv.writer(f)
            w.writerow(["entity_id"] + schemas.OTP_COLUMNS)
            for j, e in enumerate(entities):
                w.writerow([e, str(10 + j), str(20 + j), str(30 + j)])
        with open(
            os.path.join(day_dir, f"{STEMS['discovery_summary']}-{tag}.csv"),
            "w",
            newline="",
        ) as f:
            w = csv.writer(f)
            w.writerow(["entity_id"] + schemas.DISCOVERY_COLUMNS)
            for j, e in enumerate(entities):
                w.writerow([e, str(10 + j), str(20 + j), "", "5", "5"])
        with open(
            os.path.join(day_dir, f"{STEMS['user_funnel']}-{tag}.csv"), "w", newline=""
        ) as f:
            w = csv.writer(f)
            w.writerow(["entity_id", "fetch_status"])
            for e in entities:
                for r in range(uf_rows):
                    w.writerow([e, "Success" if r % 3 else "Failed"])
    spec = f"{days[0].strftime('%d_%m_%Y')} -> {days[-1].strftime('%d_%m_%Y')}"
    rec = os.path.join(base, "recipients.json")
    with open(rec, "w") as f:
        json.dump({"to": {e: [f"{e}@x.com"] for e in entities}, "cc": {}}, f)
    return spec, rec


def run_probe(n_entities: int, n_days: int, uf_rows: int) -> dict:
    from funnel_report_etl_pipeline__spark.cli import run
    from funnel_report_etl_pipeline__spark.config import EngineConfig
    from funnel_report_etl_pipeline__spark.session import get_spark

    spark = get_spark(app_name="e2e_funnel_probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up

    tmp = tempfile.mkdtemp(prefix="e2e_funnel_probe_")
    zone = os.path.join(tmp, "landing")
    t0 = time.perf_counter()
    spec, rec = synth_landing_zone(zone, n_entities, n_days, uf_rows)
    t_synth = round(time.perf_counter() - t0, 2)

    cfg = EngineConfig(data_base_path=zone, output_dir=os.path.join(tmp, "out"))
    t0 = time.perf_counter()
    written = run(spark, demo=False, date_spec=spec, cfg=cfg, recipients_path=rec)
    t_run = round(time.perf_counter() - t0, 2)
    if len(written) != n_entities:
        raise AssertionError(f"expected {n_entities} reports, wrote {len(written)}")

    # spot-check one report: total_users = 7 stage cols x (10+j) x n_days
    with open(written[0]) as f:
        rows = list(csv.reader(f))
    j = int(os.path.basename(written[0]).split("-")[0].split("_")[1])
    expect = 7 * (10 + j) * n_days
    if rows[7][2] != str(expect):
        raise AssertionError(f"report total_users {rows[7][2]} != {expect}")

    return {
        "n_entities": n_entities,
        "n_days": n_days,
        "uf_rows_per_entity_day": uf_rows,
        "n_csv_files": 4 * n_days,
        "synth_sec": t_synth,
        "e2e_run_sec": t_run,
        "n_reports": len(written),
        "ref_equivalent_queries": 3 * n_days * n_entities + n_days,
    }


def main() -> int:
    args = [int(a) for a in sys.argv[1:]]
    n_entities = args[0] if len(args) > 0 else 20
    n_days = args[1] if len(args) > 1 else 90
    uf_rows = args[2] if len(args) > 2 else 500
    print(json.dumps(run_probe(n_entities, n_days, uf_rows)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
