"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``funnel_report_etl_pipeline__spark.plans.registry``:
every implemented operator/query from SURVEY.md §2 (plus the
LLM-data-pipeline extensions) is a named QuerySpec with a DataFrame plan
and, where SQL-expressible, a DuckDB oracle. The driver smoke-checks
``entry``, then hash-compares each ``queries()`` entry against its
``oracle_sql()`` twin at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from funnel_report_etl_pipeline__spark.plans.registry import load_all, ordered_specs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the funnel waterfall over sf0.001 events —
    conditional stage counts → survivors by successive subtraction →
    guarded HALF_EVEN percentages (reference report_engine.py:233-319)."""
    specs = load_all()
    return specs["funnel_waterfall"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + extensions),
    ordered so the brief-required surface (parity + LLM-pipeline ops)
    leads: the driver verifies entries in iteration order."""
    return {name: spec.fn for name, spec in ordered_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every registered query — since
    round 5 the coverage is total (164/164 as of round 8;
    DRIVERSIM_r08.json): even the
    hash-seeded operators are formulated over md5-derived integers /
    deterministic medoids so they verify value-exactly. A spec with
    ``oracle=None`` would fall back to the driver's rows-only check, but
    none currently exists."""
    return {
        name: spec.oracle
        for name, spec in ordered_specs().items()
        if spec.oracle is not None
    }
