"""Multi-dimensional data layout: Z-order (Morton) clustering for
min/max-stat file pruning on MORE THAN ONE column.

A range-partitioned/sorted layout prunes scans on its one sort key and
nothing else; at 100 TB, queries that filter on a second dimension
re-read the whole table. Interleaving the bits of k normalized columns
into one Morton key and range-partitioning on THAT gives every output
file a roughly hyper-cubic region of the key space, so parquet
min/max footer stats become selective on EVERY interleaved column at
once (each dimension prunes ~n_files^(1/k) worse than its dedicated
sort, instead of not at all). This is the same layout Delta/Iceberg
expose as ``OPTIMIZE ZORDER BY``; here it is plain PySpark over plain
parquet — the key is computed with built-in bitwise expressions inside
whole-stage codegen, the distribution is one ``repartitionByRange``.

tests/test_layout.py measures the pruning on real footer stats: a
Z-ordered write bounds the WORST dimension's file-overlap fraction where
the single-key sort degenerates to a full scan.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale_to_bits(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Map a value from [cmin, cmax] onto the integer grid [0, 2^bits):
    rank-free min/max normalization — monotone, so range predicates on the
    original column translate to range predicates on the grid cell.
    Numeric columns only (int/long/float/double/decimal) — date/timestamp
    inputs must be cast to epoch numbers by the caller; span is the exact
    (cmax - cmin) with a degenerate-span and right-edge guard, so the
    normalization is type-agnostic across int and double columns."""
    span = (cmax - cmin).cast("double")
    cell = F.when(
        span <= 0, F.lit(0)  # constant column: every row in cell 0
    ).otherwise(
        ((col - cmin).cast("double") / span * (1 << bits)).cast("long")
    )
    # right-edge guard: col == cmax lands exactly on 2^bits
    return F.least(cell, F.lit((1 << bits) - 1))


def zorder_key(scaled: list[Column], bits: int) -> Column:
    """Morton interleave: bit i of column j lands at position
    i * k + (k - 1 - j) of the key. Pure shift/and/or expression tree
    (k * bits terms), fully inside whole-stage codegen — no UDF."""
    k = len(scaled)
    if k * bits > 63:
        # the interleaved key must fit a signed long: bit k*bits-1 at
        # position 63 is the sign bit, which would sort high keys BEFORE
        # low keys and silently break the clustering for half the space
        raise ValueError(
            f"zorder key needs {k * bits} bits but a signed long holds 63; "
            f"use bits<={63 // k} for {k} columns"
        )
    parts: list[Column] = []
    for i in range(bits):
        for j, c in enumerate(scaled):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            parts.append(F.shiftleft(bit, i * k + (k - 1 - j)))
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def with_zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16, key_col: str = "__zkey"
) -> DataFrame:
    """Attach the Morton key. Column min/max are computed in one pass and
    broadcast back (k-column agg row — driver-sized like any write-planning
    statistic). ``bits`` is auto-clamped to 63 // k so the interleaved key
    always fits a signed long (zorder_key raises otherwise)."""
    bits = min(bits, 63 // max(len(cols), 1))
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
    stats = df.agg(*aggs)
    joined = df.crossJoin(F.broadcast(stats))
    scaled = [
        _scale_to_bits(
            F.col(c), F.col(f"__min_{c}"), F.col(f"__max_{c}"), bits
        )
        for c in cols
    ]
    return joined.withColumn(key_col, zorder_key(scaled, bits)).drop(
        *[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols]
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 64,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet: Morton key → range partition (contiguous
    key slabs per file) → in-file sort → drop the key. Each output file
    covers a compact region of the (cols) space, so its parquet footer
    min/max stats prune multi-dimensional predicates. One extra range
    exchange at write time buys footer-level pruning on every ``cols``
    member for every subsequent scan — the standard write-once/read-many
    trade."""
    keyed = with_zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .parquet(path)
    )
