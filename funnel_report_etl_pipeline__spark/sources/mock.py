"""Demo/mock source: raw-shaped fixtures that reproduce the golden report.

The reference ships pre-aggregated mock frames (report_engine.py:326-367)
that bypass its fetch layer. Our fixtures are **raw dataset shaped**
(string-typed CSV contract, FIXTURES.md) so the demo path exercises the
full aggregate pipeline — casts, NULLIF, truncation, grouped counts — and
still lands on the same golden totals:

    stage sums   800/450/1050/600/1600/1950/1250/150/1100/820/50
    otp          0 / 450 / 1200
    discovery    350 / 600 / 400 / 150 / 200   (with ''-cells exercised)
    user_funnel  Success=820 Failed=230 'Not Attempted'=50 (+junk rows)

Golden derived values (verified against the reference demo workbook,
SURVEY.md §5): total_users=7700, survivors 6900/5400/3700/2100,
otp_ok_drop=-150 (negative is correct), approved pct 16.2, shared 10.6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from funnel_report_etl_pipeline__spark import schemas

MOCK_ENTITY = "FIU_001"


def mock_funnel_frames(
    spark: SparkSession, entity_id: str = MOCK_ENTITY
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Return (uf_stages, otp_summary, discovery_summary, user_funnel) raw frames."""

    # Two dates whose per-cell truncated values sum to the golden stage
    # totals; fractional strings exercise cast-then-truncate (A6: each cell
    # astype(float).astype(int) BEFORE the sum — 300.9 contributes 300).
    stage_rows = [
        (entity_id, "14-02-2026", "500", "250.0", "550", "300.9", "900", "1000", "650", "80", "600", "420", "30"),
        (entity_id, "15-02-2026", "300", "200", "500.7", "300.1", "700", "950", "600", "70", "500", "400", "20"),
        # foreign entity row — must be filtered out by the Entity_ID predicate
        ("FIU_OTHER", "15-02-2026", "9999", "9999", "9999", "9999", "9999", "9999", "9999", "9999", "9999", "9999", "9999"),
    ]
    # golden check: 500+300=800, 250+200=450, 550+500=1050, 300+300=600,
    # 900+700=1600, 1000+950=1950, 650+600=1250, 80+70=150, 600+500=1100,
    # 420+400=820, 30+20=50.
    uf_stages = spark.createDataFrame(stage_rows, schemas.UF_STAGES_SCHEMA)

    otp_rows = [
        (entity_id, "0", "200", "700"),
        (entity_id, "0", "250", "500"),
        ("FIU_OTHER", "777", "777", "777"),
    ]
    otp_summary = spark.createDataFrame(otp_rows, schemas.OTP_SUMMARY_SCHEMA)

    # ''-cells → NULL → ignored by SUM (A2); totals 350/600/400/150/200
    discovery_rows = [
        (entity_id, "350", "400", "", "150", "200"),
        (entity_id, "", "200", "400", "", ""),
        ("FIU_OTHER", "777", "777", "777", "777", "777"),
    ]
    discovery_summary = spark.createDataFrame(discovery_rows, schemas.DISCOVERY_SUMMARY_SCHEMA)

    # row-grain: multiplicities 820/230/50 + junk rows exercising the
    # IN-list, NOT NULL and <>'' predicates (F2/F3)
    fi_rows = (
        [(entity_id, "Success")] * 820
        + [(entity_id, "Failed")] * 230
        + [(entity_id, "Not Attempted")] * 50
        + [(entity_id, None), (entity_id, ""), (entity_id, "Bogus"), ("FIU_OTHER", "Success")]
    )
    user_funnel = spark.createDataFrame(fi_rows, schemas.USER_FUNNEL_SCHEMA)

    return uf_stages, otp_summary, discovery_summary, user_funnel
