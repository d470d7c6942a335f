"""Skew-mitigation helpers: salted two-phase aggregation.

AQE's skew-join handling covers joins; a *grouped aggregation* with a
pathological hot key still funnels that key's rows to one reducer. Salting
splits each key across ``n_salts`` partial groups, then re-aggregates —
the classic two-phase trick, valid for any algebraic aggregate (sum,
count, min, max). Results are identical to the unsalted plan (the salted
variant is oracle-verified against the same SQL as its unsalted twin).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["with_salt", "salted_grouped_agg"]


def with_salt(df: DataFrame, n_salts: int = 16, col: str = "__salt") -> DataFrame:
    """Uniform per-row salt. monotonically_increasing_id spreads rows
    within a partition; the value is partitioning-dependent, which is fine
    — any assignment is valid for algebraic re-aggregation."""
    return df.withColumn(col, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))


def salted_grouped_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """groupBy(keys ⊕ salt).agg(partial) → groupBy(keys).agg(final).

    ``partial_aggs``: alias → aggregate over raw rows.
    ``final_aggs``: alias → aggregate over the partial columns.
    The hot key's rows land on n_salts reducers instead of one.
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "__salt").agg(
        *[c.alias(a) for a, c in partial_aggs.items()]
    )
    return partial.groupBy(*keys).agg(*[c.alias(a) for a, c in final_aggs.items()])
