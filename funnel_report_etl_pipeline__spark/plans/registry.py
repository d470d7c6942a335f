"""Query registry: every engine capability as a named (Spark, oracle-SQL) pair.

Each entry is one operator/query from SURVEY.md §2's inventory (or a
beyond-reference extension), expressed twice:

* ``fn(spark, sf_dir) -> DataFrame`` — the engine's DataFrame-API plan.
* ``oracle`` — equivalent ANSI SQL for DuckDB over the same parquet
  tables, used by the driver's hash-compare correctness gate. ``None``
  for genuinely non-SQL-expressible ops (driver does a rows-only check).

Cross-engine determinism rules (verified empirically, see functions/core):

* double SUMs go through ``dsum`` (exact decimal, then one cast to
  double) — bit-identical on any partitioning and in DuckDB;
* Spark ``bround`` pairs with DuckDB ``round_even`` (both HALF_EVEN);
* truncating double→int pairs Spark ``cast(long)`` with DuckDB
  ``CAST(TRUNC(x) AS BIGINT)``;
* every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default=())
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""), tags, bench)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every module that registers queries; return the registry."""
    # imports are side-effecting (decorators fill REGISTRY)
    from funnel_report_etl_pipeline__spark.plans import (  # noqa: F401
        parity,
        relational,
        pipeline_ops,
    )

    return REGISTRY
