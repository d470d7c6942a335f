"""Scalar/aggregate expression helpers shared across operators.

All helpers return Column expressions built from `pyspark.sql.functions`
only — JVM-side, codegen'd, no Python in the data path. They encode the
reference's numeric parity pitfalls (SURVEY.md §7.3):

* Python ``round`` is HALF_EVEN → Spark ``bround`` (not ``round``).
* ``astype(float).astype(int)`` truncates toward zero → ``cast("long")``.
* Drill ``NULLIF(c,'')`` empty-string→NULL before SUM.
* Cross-engine float determinism: a double SUM is order-dependent at the
  last ulp, so any value that is hash-compared against another engine is
  summed in exact decimal and only then cast back to double (``dsum``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def nullif_empty(col: Column | str) -> Column:
    """Drill `NULLIF(c, '')` (reference report_engine.py:149-153)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(c, F.lit(""))


def sum_cast_double(col: Column | str, *, nullif: bool = False) -> Column:
    """`SUM(CAST(c AS DOUBLE))`, optionally with the empty-string guard
    (reference A1/A2, report_engine.py:123-125, 149-153)."""
    c = F.col(col) if isinstance(col, str) else col
    if nullif:
        c = F.nullif(c, F.lit(""))
    # try_cast: under Spark 4's default ANSI mode a bare cast on a malformed
    # cell kills the job; the reference degraded to NULL/empty → 0.
    return F.sum(c.try_cast("double"))


def trunc_long(col: Column | str) -> Column:
    """Truncate-toward-zero double→long, matching pandas
    ``astype(float).astype(int)`` (reference report_engine.py:225).
    try_cast so malformed cells become NULL (ANSI-safe), as the reference's
    error path degraded to empty frames rather than raising."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("double").try_cast("long")


def pct_of(value: Column, total: Column) -> Column:
    """Percent-of-total, 1 decimal, HALF_EVEN, 0 when total<=0
    (reference `_pct`, report_engine.py:228-230; Python round is
    banker's rounding → ``bround``)."""
    return F.when(total > 0, F.bround(value.cast("double") / total * 100, 1)).otherwise(
        F.lit(0.0)
    )


def dsum(col: Column | str, precision: int = 22, scale: int = 4) -> Column:
    """Order-independent exact sum, returned as double.

    Summing doubles is non-associative; two engines (or two partitionings
    of the same engine) can disagree in the last ulp, which breaks
    hash-compared oracles AND makes results non-deterministic across
    cluster sizes. Summing in decimal is exact, so the result is identical
    on 1 core or 1000 executors; the final cast back to double is a single
    deterministic conversion.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def pct_py(value: float, total: float) -> float:
    """Driver-side twin of ``pct_of`` for the presentation sink: Python
    round IS HALF_EVEN, matching the reference `_pct` exactly
    (report_engine.py:228-230)."""
    return round(value / total * 100, 1) if total and total > 0 else 0
