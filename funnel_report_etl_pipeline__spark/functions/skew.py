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

__all__ = ["with_salt", "salted_grouped_agg", "salted_join"]


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


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the skewed (left) side per-row, replicate
    the small-enough-to-copy (right) side once per salt value, join on
    (key, salt). The hot key's rows spread across ``n_salts`` reducers
    instead of one; results are identical to the plain join (each left row
    matches exactly the one right replica carrying its salt).

    Complementary to AQE skew-join (which splits oversized *partitions*
    post-shuffle): salting also handles the single-hot-KEY case where one
    key exceeds any partition split, at the cost of an n_salts× right-side
    replication — keep the replicated side the smaller one. Inner/left
    joins only (replication would duplicate right-side non-matches under
    right/outer semantics)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = "__sj_salt"
    clash = [c for c in (*left.columns, *right.columns) if c == salt]
    if clash:
        # overwriting a caller's column would silently corrupt it on the
        # left and raise AMBIGUOUS_REFERENCE later on the right — fail now
        raise ValueError(f"salted_join: input already has a {salt!r} column")
    spark = left.sparkSession
    l = with_salt(left, n_salts, col=salt)
    salts = spark.range(n_salts).select(F.col("id").cast("long").alias(salt))
    r = right.crossJoin(F.broadcast(salts))
    cond = (l[left_key] == r[right_key]) & (l[salt] == r[salt])
    return l.join(r, cond, how).drop(salt)
