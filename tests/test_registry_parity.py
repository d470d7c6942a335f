"""Every registered query vs its DuckDB oracle at sf0.001 (fast gate).

Mirrors the driver's correctness check: row count, column names, and raw
value equality (rows sorted by all columns, columns by name). Queries
without an oracle get a runs-and-returns smoke check.
"""

from __future__ import annotations


import pytest

from funnel_report_etl_pipeline__spark.plans.registry import load_all

from .conftest import SF_SMALL

SPECS = load_all()


def _eq(a, b) -> bool:
    try:
        import pandas as pd

        if pd.isna(a) and pd.isna(b):  # NaN, NaT, None — all null-equal
            return True
    except (TypeError, ValueError):
        pass
    return a == b


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, duck):
    spec = SPECS[name]
    sdf = spec.fn(spark, SF_SMALL).toPandas()
    if spec.oracle is None:
        assert len(sdf) >= 0  # rows-only: runs and has a stable schema
        return
    odf = duck.execute(spec.oracle).df()
    assert len(sdf) == len(odf), f"rows: spark={len(sdf)} duckdb={len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns)
    cols = sorted(sdf.columns)
    # array cells are unsortable as-is — canonicalize exactly like the
    # strict driver replica does
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent / "tools"))
    from driver_sim import canon

    s = canon(sdf[cols]).sort_values(by=cols, ignore_index=True)
    o = canon(odf[cols]).sort_values(by=cols, ignore_index=True)
    for c in cols:
        for i in range(len(s)):
            assert _eq(s[c].iloc[i], o[c].iloc[i]), (
                f"{name}.{c}[{i}]: spark={s[c].iloc[i]!r} duckdb={o[c].iloc[i]!r}"
            )


def test_every_query_has_tags_and_doc():
    for name, spec in SPECS.items():
        assert spec.doc.strip(), f"{name} lacks a docstring"
        assert spec.tags, f"{name} lacks tags"
