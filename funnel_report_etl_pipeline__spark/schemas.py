"""Explicit schemas.

The reference relies on Drill/pandas schema inference plus a documented
fixed column contract (SURVEY.md §1.3; reference report_engine.py:207-219,
docs/DATA_SOURCES.md:25-35). At 100 TB inference is a non-starter — a
schema drift would silently change results — so every dataset gets an
explicit ``StructType`` and readers use FAILFAST in strict mode.

All numeric columns of the four reference CSVs are **string-typed at
scan** (Drill delivered strings; the reference always ``CAST``s — see
reference report_engine.py:123-125, 149-153). We preserve that: casts are
explicit, applied in the operators, so empty-string→NULL semantics match.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Reference dataset 1: uf-stages (grain: entity x date)
# 11 stage columns; the key column is `Entity_ID` (capitalized — the other
# three datasets use `entity_id`; the inconsistency is part of the contract,
# reference report_engine.py:99 vs :126,:154,:181).
# ---------------------------------------------------------------------------

STAGE_COLUMNS: list[str] = [
    "AA_client_Initialization",
    "OTP_Based_Sign_in_Sign_up",
    "View_Consent_Details",
    "Discovery",
    "Linking",
    "Rejected_Consent_Requests",
    "Approved_Consent_Requests",
    "FIP_Rejected_Consent_Artefacts",
    "FIP_Accepted_Consent_Artefacts",
    "Data_Fetch_Success",
    "Data_Fetch_Not_Attempted",
]

UF_STAGES_SCHEMA = T.StructType(
    [T.StructField("Entity_ID", T.StringType()), T.StructField("Date", T.StringType())]
    + [T.StructField(c, T.StringType()) for c in STAGE_COLUMNS]
)

# ---------------------------------------------------------------------------
# Reference dataset 2: otp-summary (grain: entity x date)
# ---------------------------------------------------------------------------

OTP_COLUMNS: list[str] = [
    "Correct_OTP_Entered",
    "Incorrect_OTP_Entered",
    "OTP_Not_Entered",
]

OTP_SUMMARY_SCHEMA = T.StructType(
    [T.StructField("entity_id", T.StringType())]
    + [T.StructField(c, T.StringType()) for c in OTP_COLUMNS]
)

# ---------------------------------------------------------------------------
# Reference dataset 3: discovery-summary (grain: entity x date)
# Cells may be empty strings → NULL (reference report_engine.py:149-153).
# ---------------------------------------------------------------------------

DISCOVERY_COLUMNS: list[str] = [
    "Account_Discovered",
    "Account_not_Found",
    "FIP_Not_Selected",
    "Failure",
    "NO_STATUS",
]

DISCOVERY_SUMMARY_SCHEMA = T.StructType(
    [T.StructField("entity_id", T.StringType())]
    + [T.StructField(c, T.StringType()) for c in DISCOVERY_COLUMNS]
)

# ---------------------------------------------------------------------------
# Reference dataset 4: user-funnel (row grain: one row per user/attempt)
# ---------------------------------------------------------------------------

FETCH_STATUSES: tuple[str, ...] = ("Not Attempted", "Failed", "Success")

USER_FUNNEL_SCHEMA = T.StructType(
    [
        T.StructField("entity_id", T.StringType()),
        T.StructField("fetch_status", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Driver testdata tables (/root/testdata/sf*/ — TESTDATA.md). Explicit
# schemas let tests assert against drift; readers still read parquet's
# embedded schema (parquet is self-describing), these are the contracts.
# ---------------------------------------------------------------------------

TESTDATA_TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

# Typed output contract of the funnel engine (the reference's untyped
# list-of-lists presentation table, reference report_engine.py:293-319,
# becomes a typed relation; layout is a sink concern).
FUNNEL_REPORT_SCHEMA = T.StructType(
    [
        T.StructField("row_id", T.IntegerType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("positive_action", T.StringType()),
        T.StructField("success_count", T.LongType()),
        T.StructField("success_pct", T.DoubleType()),
        T.StructField("dropoff_cause", T.StringType()),
        T.StructField("dropoff_count", T.LongType()),
        T.StructField("dropoff_pct", T.DoubleType()),
        T.StructField("is_subcause", T.BooleanType(), False),
    ]
)
