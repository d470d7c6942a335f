"""Round-6 queries: the grouped all-entity funnel production path under a
full value-hash oracle, plus round-6 additions.

``entity_funnel_metrics`` (operators/funnel.py:203) is the biggest
architectural win over the reference — ONE grouped Spark job where
run_reports.py:212-243 loops entities sequentially on the driver — but
until this round it was golden-tested only. Here the four reference
input datasets (uf-stages / otp-summary / discovery-summary /
user-funnel, SURVEY.md §2.1) are derived deterministically from the
shared ``events`` parquet over PARTIALLY-OVERLAPPING entity ranges, so
the entity-spine union semantics (an entity present only in OTP data
still gets a zeros-elsewhere report row) is exercised by data, and the
whole waterfall arithmetic is hash-verified against a DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from funnel_report_etl_pipeline__spark.plans.registry import register
from funnel_report_etl_pipeline__spark.schemas import (
    DISCOVERY_COLUMNS,
    OTP_COLUMNS,
    STAGE_COLUMNS,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# Entity key: user_id % 17, as the reference's string Entity_ID. The four
# datasets cover overlapping-but-distinct ranges so some entities exist in
# only one dataset — the spine-union case the reference handles by querying
# each dataset independently per entity (run_reports.py:212).
_ENT = "CAST(user_id % 17 AS VARCHAR)"  # DuckDB oracle spelling

_STAGE_SRC = "view"  # entities 0-9
_OTP_SRC = "signup"  # entities 5-14
_DISC_SRC = "click"  # entities 8-16
_UF_SRC = ("purchase", "error")  # entities 3-12


def _entity_inputs(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Derive the four reference datasets from events, deterministically.

    Cell values are integer-valued strings built from event_id (so
    trunc/cast semantics are exact on both engines); discovery cells blank
    out every 7th row to exercise the NULLIF('') path
    (report_engine.py:149-153)."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "entity", (F.col("user_id") % 17).cast("string")
    )
    ent = F.col("entity").cast("int")

    uf_stages = (
        ev.filter((F.col("event_type") == _STAGE_SRC) & (ent < 10))
        .select(
            F.col("entity").alias("Entity_ID"),
            *[
                ((F.col("event_id") + i) % 100).cast("string").alias(c)
                for i, c in enumerate(STAGE_COLUMNS)
            ],
        )
    )
    otp_summary = (
        ev.filter((F.col("event_type") == _OTP_SRC) & ent.between(5, 14))
        .select(
            F.col("entity").alias("entity_id"),
            *[
                ((F.col("event_id") + j) % 50).cast("string").alias(c)
                for j, c in enumerate(OTP_COLUMNS)
            ],
        )
    )
    discovery_summary = (
        ev.filter((F.col("event_type") == _DISC_SRC) & ent.between(8, 16))
        .select(
            F.col("entity").alias("entity_id"),
            *[
                F.when((F.col("event_id") + k) % 7 == 0, F.lit("")).otherwise(
                    ((F.col("event_id") + k) % 40).cast("string")
                ).alias(c)
                for k, c in enumerate(DISCOVERY_COLUMNS)
            ],
        )
    )
    user_funnel = (
        ev.filter(F.col("event_type").isin(*_UF_SRC) & ent.between(3, 12))
        .select(
            F.col("entity").alias("entity_id"),
            F.element_at(
                F.array(F.lit("Success"), F.lit("Failed"), F.lit("Not Attempted"), F.lit("")),
                (F.col("event_id") % 4 + 1).cast("int"),
            ).alias("fetch_status"),
        )
    )
    return uf_stages, otp_summary, discovery_summary, user_funnel


def _oracle_stage_cols() -> str:
    return ",\n             ".join(
        f"SUM((event_id + {i}) % 100) AS {c}" for i, c in enumerate(STAGE_COLUMNS)
    )


# The oracle mirrors entity_funnel_metrics exactly: four grouped aggregates,
# distinct-union spine, left joins, then the waterfall arithmetic of
# _metrics_columns (operators/funnel.py:95-167) — including total_users'
# 7-column formula, the possibly-negative otp_ok_drop, and the
# cross-dataset fi_fetch_drop. All cell values are integral so DuckDB's
# round-on-cast and Spark's truncate-on-cast agree.
_ENTITY_WATERFALL_ORACLE = f"""
WITH base AS (
  SELECT *, {_ENT} AS entity, CAST(user_id % 17 AS BIGINT) AS ent_i FROM events
),
st AS (
  SELECT entity AS entity_id,
             {_oracle_stage_cols()}
  FROM base WHERE event_type = '{_STAGE_SRC}' AND ent_i < 10
  GROUP BY entity
),
ot AS (
  SELECT entity AS entity_id,
         {", ".join(f"SUM((event_id + {j}) % 50) AS Total_{c}" for j, c in enumerate(OTP_COLUMNS))}
  FROM base WHERE event_type = '{_OTP_SRC}' AND ent_i BETWEEN 5 AND 14
  GROUP BY entity
),
dc AS (
  SELECT entity AS entity_id,
         {", ".join(
             f"SUM(CASE WHEN (event_id + {k}) % 7 = 0 THEN NULL ELSE (event_id + {k}) % 40 END) AS {c}_disc"
             for k, c in enumerate(DISCOVERY_COLUMNS)
         )}
  FROM base WHERE event_type = '{_DISC_SRC}' AND ent_i BETWEEN 8 AND 16
  GROUP BY entity
),
fi AS (
  SELECT entity AS entity_id,
         COUNT(CASE WHEN event_id % 4 = 0 THEN 1 END) AS fi_success,
         COUNT(CASE WHEN event_id % 4 = 1 THEN 1 END) AS fi_failed
  FROM base
  WHERE event_type IN {tuple(_UF_SRC)} AND ent_i BETWEEN 3 AND 12
    AND CASE event_id % 4 WHEN 0 THEN 'Success' WHEN 1 THEN 'Failed'
        WHEN 2 THEN 'Not Attempted' ELSE '' END
        IN ('Not Attempted', 'Failed', 'Success')
  GROUP BY entity
),
spine AS (
  SELECT DISTINCT entity_id FROM (
    SELECT entity_id FROM st UNION ALL SELECT entity_id FROM ot
    UNION ALL SELECT entity_id FROM dc UNION ALL SELECT entity_id FROM fi
  )
),
wide AS (
  SELECT spine.entity_id,
         {", ".join(f"COALESCE(CAST(st.{c} AS BIGINT), 0) AS {c}" for c in STAGE_COLUMNS)},
         {", ".join(f"COALESCE(CAST(ot.Total_{c} AS BIGINT), 0) AS Total_{c}" for c in OTP_COLUMNS)},
         {", ".join(f"COALESCE(CAST(dc.{c}_disc AS BIGINT), 0) AS {c}_disc" for c in DISCOVERY_COLUMNS)},
         COALESCE(fi.fi_success, 0) AS fi_success,
         COALESCE(fi.fi_failed, 0) AS fi_failed
  FROM spine
  LEFT JOIN st USING (entity_id) LEFT JOIN ot USING (entity_id)
  LEFT JOIN dc USING (entity_id) LEFT JOIN fi USING (entity_id)
),
m AS (
  SELECT entity_id,
         AA_client_Initialization AS d1,
         OTP_Based_Sign_in_Sign_up AS d2,
         View_Consent_Details AS view_drop,
         Discovery AS stage_disc,
         Account_Discovered_disc + Account_not_Found_disc + FIP_Not_Selected_disc
           + Failure_disc + NO_STATUS_disc AS d3,
         Linking AS d4,
         Rejected_Consent_Requests AS rej,
         Approved_Consent_Requests AS appr,
         FIP_Rejected_Consent_Artefacts AS fip_rej,
         FIP_Accepted_Consent_Artefacts AS fip_ok,
         Data_Fetch_Success AS fetch_ok,
         Data_Fetch_Not_Attempted AS not_attempted,
         Total_Incorrect_OTP_Entered AS otp_wrong,
         Total_OTP_Not_Entered AS otp_miss,
         Account_not_Found_disc AS no_rec,
         NO_STATUS_disc AS fip_fail,
         Failure_disc AS some_fail,
         Account_Discovered_disc + FIP_Not_Selected_disc AS found_not_linked,
         fi_success + fi_failed AS fi_req_ok
  FROM wide
)
SELECT entity_id,
       d1 + d2 + view_drop + stage_disc + d4 + rej + appr AS total_users,
       d1,
       d2 + view_drop AS auth_drop,
       otp_wrong, otp_miss,
       d2 - (otp_wrong + otp_miss) + view_drop AS otp_ok_drop,
       d3, no_rec, fip_fail, some_fail, found_not_linked,
       d4, rej, appr, fip_rej, fip_ok, fi_req_ok, not_attempted, fetch_ok,
       fi_req_ok - fetch_ok AS fi_fetch_drop,
       d1 + d2 + view_drop + stage_disc + d4 + rej + appr AS n_consent,
       d2 + view_drop + stage_disc + d4 + rej + appr AS n_after_init,
       stage_disc + d4 + rej + appr AS n_after_auth,
       stage_disc + d4 + rej + appr - d3 AS n_after_disc,
       stage_disc + rej + appr - d3 AS n_after_link
FROM m
"""


@register(
    "entity_funnel_waterfall",
    oracle=_ENTITY_WATERFALL_ORACLE,
    tags=("pipeline-r6", "funnel", "FN2"),
)
def entity_funnel_waterfall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-entity funnel waterfall through the REAL production operator
    (`entity_funnel_metrics`, operators/funnel.py:203): four grouped
    aggregations on the entity key, distinct-union entity spine, left
    joins, then the reference waterfall arithmetic per entity — one Spark
    job where the reference loops entities on the driver
    (run_reports.py:212-243). Input datasets are derived from events over
    overlapping entity ranges so the spine's only-in-one-dataset case is
    live. Each join side is pre-aggregated to one row per entity, so at
    100 TB the join input stays |entities|-sized regardless of raw
    volume."""
    from funnel_report_etl_pipeline__spark.operators.funnel import entity_funnel_metrics

    uf, ot, dc, fi = _entity_inputs(spark, sf_dir)
    return entity_funnel_metrics(uf, ot, dc, fi)
