"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the latest right row with ``right_ts <= left_ts``
(per key). The naive formulation is a range join that explodes to
left × right-history; this implementation is the **union + ordered window**
composition: tag both sides, union on the key/time axis, and carry the most
recent right payload forward with ``last(..., ignoreNulls)`` over a
rows-unbounded-preceding window. ``direction="forward"`` mirrors the frame
(earliest right ≥ left_ts); ``direction="nearest"`` computes both picks
over the SAME key partitioning and chooses the smaller time gap per row
(ties to the backward side, pandas ``merge_asof`` semantics).

Cost at 100 TB: ONE shuffle on the key (the window's partitioning; nearest
adds a second in-partition sort, not a second exchange), state per row is
a single struct — no range-join blowup, no broadcast of a history table.
Ties at the same timestamp resolve right-before-left (a right row at
exactly left_ts matches), and among right rows by the ordered tiebreak
column, so results are engine-deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def _window(on: list[str], direction: str, right_tiebreak: str | None):
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
        return lambda c: F.last(c, ignorenulls=True).over(w)
    # mirrored: left rows sort before right at equal __t (so a right row
    # AT left_ts still matches ">="), first(ignoreNulls) over the
    # following frame picks the nearest later right payload
    order = [F.col("__t").asc(), F.col("__is_left").desc()]
    if right_tiebreak is not None:
        order.append(F.col(f"__r_{right_tiebreak}").asc_nulls_last())
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return lambda c: F.first(c, ignorenulls=True).over(w)


def _stale(ts_col: Column, gap_us: Column, tolerance_seconds: int | None) -> Column:
    if tolerance_seconds is None:
        return ts_col.isNull()
    return ts_col.isNull() | (gap_us > tolerance_seconds * 1_000_000)


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
    """left + the as-of right row per `on` key: latest right ≤ left_ts
    (``backward``, default), earliest right ≥ left_ts (``forward``), or
    whichever of the two sits closer in time (``nearest``, ties to the
    backward match) — the three pandas ``merge_asof`` directions.

    right_cols: right payload columns to attach (prefixed ``asof_``).
    tolerance_seconds: optional max time gap — matches farther than
    ``tolerance`` from left_ts become NULL (for ``nearest``, each side is
    tolerance-filtered BEFORE the choice, pandas semantics).
    right_tiebreak: column ordering right rows that share a timestamp
    (highest wins backward, lowest forward); without it, same-ts right
    payloads are engine-order dependent (the attached ``asof_<ts>``
    itself is always deterministic).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
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

    sides = ("backward", "forward") if direction == "nearest" else (direction,)
    carried: dict[str, Column] = {}
    for side in sides:
        pick = _window(on, side, right_tiebreak)
        tag = side[0]  # "b" / "f"
        for c in right_cols:
            carried[f"__c{tag}_{c}"] = pick(F.col(f"__r_{c}"))
        carried[f"__c{tag}_ts"] = pick(F.col("__r_ts"))

    out = u.select(
        *on,
        "__t",
        "__is_left",
        *lp,
        *[v.alias(k) for k, v in carried.items()],
    ).filter(F.col("__is_left") == 1)

    t_us = F.unix_micros(F.col("__t"))
    sel = [*on, F.col("__t").alias(left_ts), *lp]
    if direction == "nearest":
        gap_b = t_us - F.unix_micros(F.col("__cb_ts"))
        gap_f = F.unix_micros(F.col("__cf_ts")) - t_us
        dead_b = _stale(F.col("__cb_ts"), gap_b, tolerance_seconds)
        dead_f = _stale(F.col("__cf_ts"), gap_f, tolerance_seconds)
        # pick backward when forward is dead, or both alive and gap_b <= gap_f
        use_b = ~dead_b & (dead_f | (gap_b <= gap_f))
        both_dead = dead_b & dead_f

        def choose(b: Column, f: Column) -> Column:
            return F.when(both_dead, F.lit(None)).otherwise(
                F.when(use_b, b).otherwise(f)
            )

        sel.append(
            choose(F.col("__cb_ts"), F.col("__cf_ts")).alias(f"asof_{right_ts}")
        )
        for c in right_cols:
            sel.append(
                choose(F.col(f"__cb_{c}"), F.col(f"__cf_{c}")).alias(f"asof_{c}")
            )
    else:
        tag = direction[0]
        ts_c = F.col(f"__c{tag}_ts")
        gap = (t_us - F.unix_micros(ts_c)) if direction == "backward" else (
            F.unix_micros(ts_c) - t_us
        )
        stale = _stale(ts_c, gap, tolerance_seconds)
        sel.append(F.when(~stale, ts_c).alias(f"asof_{right_ts}"))
        for c in right_cols:
            sel.append(F.when(~stale, F.col(f"__c{tag}_{c}")).alias(f"asof_{c}"))
    return out.select(*sel)
