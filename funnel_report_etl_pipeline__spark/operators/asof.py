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
    direction: str = "backward",
) -> DataFrame:
    """left + (latest right ≤ left_ts) per `on` key — or, with
    ``direction="forward"``, the EARLIEST right ≥ left_ts (pandas
    ``merge_asof`` directions; both are the same union + one-key-shuffle
    window composition, mirrored).

    right_cols: right payload columns to attach (prefixed ``asof_``).
    tolerance_seconds: optional max staleness — matches farther than
    ``tolerance`` from left_ts (older for backward, later for forward)
    become NULL (pandas ``merge_asof`` semantics).
    right_tiebreak: column ordering right rows that share a timestamp
    (highest wins backward, lowest forward); without it, same-ts right
    payloads are engine-order dependent (the attached ``asof_<ts>``
    itself is always deterministic).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
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

    if direction == "backward":
        # right rows sort before left at equal __t → "<=" match semantics;
        # last(ignoreNulls) over the preceding frame carries the most
        # recent right payload forward
        order = [F.col("__t").asc(), F.col("__is_left").asc()]
        if right_tiebreak is not None:
            order.append(F.col(f"__r_{right_tiebreak}").asc_nulls_first())
        w = (
            Window.partitionBy(*on)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        # mirrored: left rows sort before right at equal __t (so a right
        # row AT left_ts still matches ">="), first(ignoreNulls) over the
        # following frame picks the nearest later right payload
        order = [F.col("__t").asc(), F.col("__is_left").desc()]
        if right_tiebreak is not None:
            order.append(F.col(f"__r_{right_tiebreak}").asc_nulls_last())
        w = (
            Window.partitionBy(*on)
            .orderBy(*order)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    carried = {f"__c_{c}": pick(F.col(f"__r_{c}")) for c in right_cols}
    carried["__c_ts"] = pick(F.col("__r_ts"))

    out = u.select(
        *on,
        "__t",
        "__is_left",
        *lp,
        *[v.alias(k) for k, v in carried.items()],
    ).filter(F.col("__is_left") == 1)

    if direction == "backward":
        gap_us = F.unix_micros(F.col("__t")) - F.unix_micros(F.col("__c_ts"))
    else:
        gap_us = F.unix_micros(F.col("__c_ts")) - F.unix_micros(F.col("__t"))
    stale = (
        F.col("__c_ts").isNull()
        | (
            F.lit(tolerance_seconds).isNotNull()
            & (gap_us > (tolerance_seconds or 0) * 1_000_000)
        )
        if tolerance_seconds is not None
        else F.col("__c_ts").isNull()
    )
    sel = [*on, F.col("__t").alias(left_ts), *lp]
    sel.append(F.when(~stale, F.col("__c_ts")).alias(f"asof_{right_ts}"))
    for c in right_cols:
        sel.append(F.when(~stale, F.col(f"__c_{c}")).alias(f"asof_{c}"))
    return out.select(*sel)
