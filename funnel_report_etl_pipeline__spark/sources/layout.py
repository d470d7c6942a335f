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
    (k * bits terms), fully inside whole-stage codegen — no UDF.

    PRECONDITION: every input column must be a NON-NEGATIVE integer.
    shiftright sign-extends, so a negative input reads as all-ones in
    every bit position (and engines disagree on signed shifts — a
    latent oracle divergence, round-10 advice). Values ≥ 2^bits alias
    (high bits are simply not read) — callers that can't bound their
    inputs should route through ``with_zorder_key``'s min/max scaling,
    which guarantees the [0, 2^bits) range; raw callers clamp
    (``F.greatest(lit(0), …)``) or pre-shift their epoch."""
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


def zorder_key_sql(cols: list[str], bits: int) -> str:
    """DuckDB twin of ``zorder_key`` for columns that are ALREADY
    non-negative integers on the [0, 2^bits) grid (no min/max
    normalization — the form the value-hash oracle of `zorder_curve`
    uses). Identical bit placement: value bit i of column j lands at key
    bit i*k + (k-1-j)."""
    k = len(cols)
    terms = []
    for i in range(bits):
        for j, c in enumerate(cols):
            terms.append(f"((({c} >> {i}) & 1) << {i * k + (k - 1 - j)})")
    out = terms[0]
    for t in terms[1:]:
        out = f"({out} | {t})"
    return f"CAST({out} AS BIGINT)"


def file_minmax_stats(path: str, cols: list[str]) -> list[dict]:
    """Per-file min/max for ``cols`` straight from the parquet footers —
    the exact statistics a pruning scan consults. Driver-side metadata
    read (footers only, no data pages).

    Underscore-/dot-prefixed sub-paths are pruned exactly as Spark's own
    readers prune them: the round-14 commit-time CDC stages an (often
    empty) ``_changes/`` parquet INSIDE each data directory, which is
    invisible to snapshot reads but was being walked here, surfacing
    None min/max rows for files no scan would ever open (round-15
    inherited-state fix; tests/test_versioned_r13.py zorder pin)."""
    import os

    import pyarrow.parquet as pq

    out = []
    for dirpath, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for fname in sorted(files):
            if not fname.endswith(".parquet") or fname.startswith(("_", ".")):
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


def scan_partition_filters(df: DataFrame) -> list[tuple[list[str], list[str]]]:
    """STRUCTURAL pruning evidence: for every parquet scan in ``df``'s
    executed plan, a ``(root_paths, partition_filter_strings)`` tuple in
    plan order (empty filter list = an unpruned/flat scan). Root paths
    let the caller classify scans by the DIRECTORY they read — the
    optimizer legally duplicates scans (e.g. an anti-join distributed
    over a union scans the tombstone directory once per branch), so
    counting scans without locations misattributes them.

    This replaces matching `PartitionFilters: [...]` lines in
    ``executedPlan().toString()`` (round-13 advice: the text rendering
    is brittle across Spark versions — filter ordering, literal
    quoting, scan dedup — and plan strings TRUNCATE long lists). The
    JVM objects are walked directly; AdaptiveSparkPlanExec wrappers are
    descended through so AQE re-planning cannot hide a scan. Driver-side
    metadata only — nothing is executed."""
    out: list[tuple[list[str], list[str]]] = []

    def walk(node) -> None:
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
            return
        if cls == "FileSourceScanExec":
            pf = node.partitionFilters()
            filters = [pf.apply(i).toString() for i in range(pf.size())]
            roots = node.relation().location().rootPaths()
            paths = [roots.apply(i).toString() for i in range(roots.size())]
            out.append((paths, filters))
            return
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))
        # shuffle/broadcast reuse and query-stage wrappers keep their
        # child under a different accessor; covered by children() in
        # every Spark 4 node we exercise (pinned by the audits' counts)

    walk(df._jdf.queryExecution().executedPlan())
    return out
