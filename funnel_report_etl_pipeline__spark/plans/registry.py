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
        pipeline_ext,  # registers past the driver window (tag "pipeline-ext")
        pipeline_r5,  # round-5 batch, same post-window placement
        pipeline_r6,  # round-6 batch (entity waterfall + additions)
        pipeline_r7,  # round-7 batch (scale-safe rank variants + Q8/Q9)
    )

    return REGISTRY


# The external correctness gate verifies queries() in iteration order but
# caps how many entries it checks (round 2 stopped at 50) — so ordering is
# part of the scoreboard contract.  The window is an explicit curated list:
# the 13 SURVEY §2 parity queries stay pinned; the rest rotates each round
# so every registered query eventually holds an EXTERNAL green row.
# Round 7 (per the round-6 verdict's top item) rotates in the 22 queries
# that had never held a FULL external row — including approx_distinct_users
# / approx_percentiles, whose round-2 appearance predates their oracles
# (CORRECTNESS_r02 records them as rows-only `no_oracle`) — plus the four
# round-7 additions; the remaining 11 slots go to the least-recently
# verified (external row last held in round 2).  Rotated-out queries still
# register — tools/verify_parity.py and driver_sim check ALL entries, and
# every rotated-out name holds at least one external green row
# (CORRECTNESS_r0{2..6}.json).
DRIVER_WINDOW = 50

# Exactly DRIVER_WINDOW names, every one with a full value-hash oracle.
# tests/test_entry_contract.py pins this composition.
_WINDOW: tuple[str, ...] = (
    # SURVEY §2 parity surface (reference report engine semantics)
    "scan_filter_eq",
    "filter_in_notnull",
    "date_between",
    "agg_sum_cast",
    "agg_sum_nullif",
    "grouped_count",
    "partial_final_agg",
    "stage_totals",
    "union_all_days",
    "conditional_sum",
    "scalar_crossjoin",
    "pct_bround",
    "funnel_waterfall",
    # never externally verified before round 7: round-5/6 additions that
    # always landed past the 50-slot cap, plus the two approx queries
    # whose only external run was rows-only (pre-oracle, round 2)
    "similarity_ann_ivf",
    "dedup_minhash_fast",
    "bigram_lm_support",
    "balanced_source_sample",
    "length_buckets",
    "price_histogram",
    "winnow_containment_pairs",
    "boilerplate_passages",
    "approx_distinct_users",
    "approx_percentiles",
    "length_outliers",
    "kmeans_lloyd_clusters",
    "ks_drift_value",
    "shipping_priority_topk",
    "kmeans_balanced_sample",
    "hard_negative_mining",
    "referential_integrity_audit",
    "partition_freshness_audit",
    "cross_source_duplication",
    "kmeans_cluster_purity",
    "local_supplier_volume",
    "revenue_anomaly_days",
    # round-7 additions (zero external rows yet): the scale-safe variants
    # of the two global-window rank plans + the TPC-H Q8/Q9 shapes
    "user_rfm_segments_approx",
    "bm25_search_topk",
    "nation_market_share",
    "product_type_profit",
    # least-recently verified (external green row last held in round 2)
    "sessionize",
    "join_broadcast_dims",
    "window_rank",
    "topk_orders",
    "range_join_pricebands",
    "semi_anti_join",
    "sql_correlated_subquery",
    "pivot_daily_values",
    "rollup_hierarchy",
    "value_percentiles",
    "event_funnel_users",
)


def ordered_specs() -> dict[str, QuerySpec]:
    """Registry re-ordered for the driver: the curated ``_WINDOW`` (every
    entry full-oracle), then the remainder in registration order."""
    specs = load_all()
    ordered: dict[str, QuerySpec] = {}
    for name in _WINDOW:
        spec = specs.get(name)
        if spec is None or spec.oracle is None:
            # fail fast: a missing/unoracled window entry would silently
            # surface as a red row on the external scoreboard
            raise RuntimeError(f"window entry {name!r} missing or lacks an oracle")
        ordered[name] = spec
    for name, spec in specs.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
