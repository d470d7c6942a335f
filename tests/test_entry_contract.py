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
