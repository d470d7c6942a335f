"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the latest right row with ``right_ts <= left_ts``
(per key). The naive formulation is a range join that explodes to
left × right-history; this implementation is the **union + ordered window**
composition: tag both sides, union on the key/time axis, and carry the most
recent right payload forward with ``last(..., ignoreNulls)`` over a
rows-unbounded-preceding window.

Cost at 100 TB: ONE shuffle on the key (the window's partitioning), state
per row is a single struct — no range-join blowup, no broadcast of a
history table. Ties at the same timestamp resolve right-before-left (a
right row at exactly left_ts matches), and among right rows by the ordered
tiebreak column, so results are engine-deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """left + (latest right ≤ left_ts) per `on` key.

    right_cols: right payload columns to attach (prefixed ``asof_``).
    tolerance_seconds: optional max staleness — matches older than
    ``left_ts - tolerance`` become NULL (pandas ``merge_asof`` semantics).
    right_tiebreak: column ordering right rows that share a timestamp
    (highest wins); without it, same-ts right payloads are engine-order
    dependent (the attached ``asof_<ts>`` itself is always deterministic).
    """
    right_cols = right_cols or [c for c in right.columns if c not in {*on, right_ts}]
    if right_tiebreak is not None and right_tiebreak not in right_cols:
        right_cols = [*right_cols, right_tiebreak]

    lp = [c for c in left.columns if c not in on and c != left_ts]
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lp],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__r_ts"),
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lp],
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.col(right_ts).alias("__r_ts"),
    )
    u = l_tagged.unionByName(r_tagged)

    # right rows sort before left at equal __t → "<=" match semantics
    order = [F.col("__t").asc(), F.col("__is_left").asc()]
    if right_tiebreak is not None:
        order.append(F.col(f"__r_{right_tiebreak}").asc_nulls_first())
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = {
        f"__c_{c}": F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w) for c in right_cols
    }
    carried["__c_ts"] = F.last(F.col("__r_ts"), ignorenulls=True).over(w)

    out = u.select(
        *on,
        "__t",
        "__is_left",
        *lp,
        *[v.alias(k) for k, v in carried.items()],
    ).filter(F.col("__is_left") == 1)

    stale = (
        F.col("__c_ts").isNull()
        | (
            F.lit(tolerance_seconds).isNotNull()
            & (F.unix_micros(F.col("__t")) - F.unix_micros(F.col("__c_ts"))
               > (tolerance_seconds or 0) * 1_000_000)
        )
        if tolerance_seconds is not None
        else F.col("__c_ts").isNull()
    )
    sel = [*on, F.col("__t").alias(left_ts), *lp]
    sel.append(F.when(~stale, F.col("__c_ts")).alias(f"asof_{right_ts}"))
    for c in right_cols:
        sel.append(F.when(~stale, F.col(f"__c_{c}")).alias(f"asof_{c}"))
    return out.select(*sel)
