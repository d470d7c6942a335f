"""Z-order (Morton-curve) data layout: multi-dimensional clustering for
scan pruning.

A parquet lake prunes with per-file (and per-row-group) min/max stats.
Sorting by ONE key makes that key's ranges tight and every other key's
ranges full-width — a filter on the second dimension reads the whole
table. Interleaving the bits of two keys (the Morton / Z-order curve)
and range-partitioning + sorting by the interleaved value gives every
file a small rectangle of the (a, b) plane, so BOTH dimensions prune.
This is the layout trick behind Delta/Iceberg `OPTIMIZE ZORDER BY` —
implemented here engine-side: one column expression + one
repartitionByRange write, nothing proprietary.

The z-value is a fixed JVM-side expression tree (shiftleft / bitwise
OR over 2·bits terms — no UDF), and ``zvalue_sql`` emits the identical
arithmetic for DuckDB, so z-values themselves are value-hash-verifiable
(`zorder_curve` query). The layout payoff is measured, not asserted:
``file_minmax_stats`` reads parquet footers and
tests/test_layout_zorder.py shows both dimensions' per-file ranges
shrink vs a single-key sort, and point filters straddle fewer files.

At 100 TB: the write is one range exchange on the z-value (sampling-
based bounds, same cost class as any global sort-write) paid once at
layout time; every later scan with predicates on either dimension
prunes files/row groups it never opens.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` bits of two NON-NEGATIVE
    integer columns: result bit 2i is a's bit i, bit 2i+1 is b's bit i.
    Fixed left-associated OR chain — bit-identical on any engine."""
    out = None
    for i in range(bits):
        ta = F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        tb = F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        term = ta.bitwiseOR(tb)
        out = term if out is None else out.bitwiseOR(term)
    return out.cast("long")


def zvalue_sql(a: str, b: str, bits: int = 16) -> str:
    """The identical interleave as DuckDB SQL (for value-hash oracles)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    out = terms[0]
    for t in terms[1:]:
        out = f"({out} | {t})"
    return f"CAST({out} AS BIGINT)"


def write_zorder(
    df: DataFrame,
    out_path: str,
    col_a: str,
    col_b: str,
    bits: int = 16,
    n_files: int = 8,
) -> DataFrame:
    """Lay ``df`` out on the Z-curve of (col_a, col_b): range-partition
    by z-value into ``n_files`` parts (sampling-based bounds — the same
    mechanism as a sort-write), sort within each, one file per part.
    Returns the written frame (re-read, so footer stats are real)."""
    z = zvalue(F.col(col_a), F.col(col_b), bits).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(out_path)
    )
    spark = df.sparkSession
    spark.catalog.refreshByPath(out_path)
    return spark.read.parquet(out_path)


def file_minmax_stats(path: str, cols: list[str]) -> list[dict]:
    """Per-file min/max for ``cols`` straight from the parquet footers —
    the exact statistics a pruning scan consults. Driver-side metadata
    read (footers only, no data pages)."""
    import os

    import pyarrow.parquet as pq

    out = []
    for dirpath, _, files in os.walk(path):
        for fname in sorted(files):
            if not fname.endswith(".parquet"):
                continue
            meta = pq.ParquetFile(os.path.join(dirpath, fname)).metadata
            mins: dict[str, object] = {}
            maxs: dict[str, object] = {}
            for rg in range(meta.num_row_groups):
                g = meta.row_group(rg)
                for ci in range(g.num_columns):
                    c = g.column(ci)
                    name = c.path_in_schema
                    if name not in cols or c.statistics is None:
                        continue
                    st = c.statistics
                    if st.min is not None:
                        mins[name] = st.min if name not in mins else min(mins[name], st.min)
                    if st.max is not None:
                        maxs[name] = st.max if name not in maxs else max(maxs[name], st.max)
            out.append(
                {
                    "file": fname,
                    **{f"{c}_min": mins.get(c) for c in cols},
                    **{f"{c}_max": maxs.get(c) for c in cols},
                }
            )
    return out


def files_straddling(stats: list[dict], col: str, value) -> int:
    """How many files a point filter ``col = value`` must open, judged by
    footer min/max alone — the pruning metric the layout optimizes."""
    n = 0
    for s in stats:
        lo, hi = s.get(f"{col}_min"), s.get(f"{col}_max")
        if lo is None or hi is None or (lo <= value <= hi):
            n += 1
    return n
