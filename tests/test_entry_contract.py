"""Driver-contract smoke: __spark_entry__ exactly as the driver consumes it."""

from __future__ import annotations

import importlib.util

from .conftest import REPO


def _load():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", str(REPO / "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_returns_rows(spark):
    mod = _load()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert df.schema.fieldNames()  # stable, non-empty schema


def test_queries_and_oracles_consistent():
    mod = _load()
    qs, os_ = mod.queries(), mod.oracle_sql()
    assert len(qs) >= 30
    assert set(os_) <= set(qs)
    # oracle coverage must stay high: only genuinely non-SQL ops may omit
    assert len(os_) / len(qs) >= 0.85
    for name, fn in qs.items():
        assert callable(fn), name
    for name, sql in os_.items():
        assert isinstance(sql, str) and sql.strip(), name


def test_driver_window_leads_with_required_surface():
    """The external gate verifies queries() in iteration order but caps the
    number of entries it checks (50 in round 2).  The brief-required surface
    — all 13 SURVEY §2 parity queries and every LLM-pipeline query — must
    land inside that window, ahead of the beyond-reference relational tail."""
    from funnel_report_etl_pipeline__spark.plans.registry import (
        DRIVER_WINDOW,
        load_all,
    )

    mod = _load()
    window = list(mod.queries())[:DRIVER_WINDOW]
    specs = load_all()
    parity = [n for n, s in specs.items() if s.fn.__module__.endswith(".parity")]
    pipeline = [
        n for n, s in specs.items() if "pipeline" in s.tags and s.oracle is not None
    ]
    missing = (set(parity) | set(pipeline)) - set(window)
    assert not missing, f"required queries outside the driver window: {sorted(missing)}"
    # parity must come first (driver smoke-checks the reference surface first)
    assert window[: len(parity)] == parity
    # every checked row must be value-hash verified: rows-only (no-oracle)
    # variants sit past the window, and each must still be REGISTERED so the
    # driver's weaker rows-only check and pytest cover them
    oracles = mod.oracle_sql()
    assert all(n in oracles for n in window), "no-oracle query inside the window"
