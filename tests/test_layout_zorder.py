"""Z-order layout on REAL table data (orders), complementing
tests/test_layout.py's synthetic-grid box-overlap measurements: vs a
single-key sort layout, the Z-curve must give BOTH dimensions
sub-full-width per-file ranges and fewer straddled files for point
filters on the non-sort dimension — measured from the parquet footer
stats a pruning scan actually consults (sources/layout.py helpers)."""

from __future__ import annotations

from pyspark.sql import functions as F

from funnel_report_etl_pipeline__spark.sources.layout import (
    file_minmax_stats,
    files_straddling,
    write_zordered,
    zorder_key,
)

from .conftest import SF_MED


def _orders_dims(spark):
    o = spark.read.parquet(f"{SF_MED}/orders.parquet")
    day = F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
    return o.select(
        "o_orderkey",
        F.col("o_custkey").cast("int").alias("ck"),
        day.cast("int").alias("dy"),
    )


def _avg_width(stats, col):
    widths = [
        s[f"{col}_max"] - s[f"{col}_min"]
        for s in stats
        if s.get(f"{col}_min") is not None
    ]
    return sum(widths) / len(widths)


def _write_both(spark, df, tmp_path):
    naive = str(tmp_path / "naive")  # sort by ck only — the usual layout
    (
        df.repartitionByRange(16, "ck")
        .sortWithinPartitions("ck")
        .write.mode("overwrite")
        .parquet(naive)
    )
    zpath = str(tmp_path / "zord")
    write_zordered(df, zpath, ["ck", "dy"], n_files=16, bits=16)
    return file_minmax_stats(naive, ["ck", "dy"]), file_minmax_stats(zpath, ["ck", "dy"])


def test_zorder_tightens_both_dimensions_vs_single_key_sort(spark, tmp_path):
    n_stats, z_stats = _write_both(spark, _orders_dims(spark), tmp_path)
    assert len(n_stats) >= 16 and len(z_stats) >= 16
    # the sort key is tight in the naive layout — z-order gives some of
    # that up...
    assert _avg_width(n_stats, "ck") < _avg_width(z_stats, "ck")
    # ...to make the OTHER dimension prunable at all: naive leaves dy
    # full-width per file, z-order must shrink it by at least 2x
    assert _avg_width(z_stats, "dy") < _avg_width(n_stats, "dy") / 2
    # and ck stays far from full-width too (both dimensions prune)
    full_ck = max(s["ck_max"] for s in z_stats) - min(s["ck_min"] for s in z_stats)
    assert _avg_width(z_stats, "ck") < 0.8 * full_ck


def test_zorder_point_filters_straddle_fewer_files_on_second_dim(spark, tmp_path):
    n_stats, z_stats = _write_both(spark, _orders_dims(spark), tmp_path)
    probes = [100, 800, 1500, 2200]
    n_open = sum(files_straddling(n_stats, "dy", v) for v in probes)
    z_open = sum(files_straddling(z_stats, "dy", v) for v in probes)
    # naive opens every file for every dy probe; z-order must prune
    assert n_open == len(probes) * len(n_stats)
    assert z_open < n_open


def test_zorder_key_roundtrip_bits(spark):
    """Interleave correctness on exact points: de-interleaving
    zorder_key([a, b]) recovers both inputs (a at odd key bits, b at
    even — the documented i*k + (k-1-j) placement)."""
    rows = spark.range(0, 1000, 37).select(
        (F.col("id") % 300).cast("int").alias("a"),
        (F.col("id") % 171).cast("int").alias("b"),
    )
    out = rows.select(
        "a", "b", zorder_key([F.col("a"), F.col("b")], 16).alias("z")
    ).collect()
    assert out
    for r in out:
        a = b = 0
        for i in range(16):
            a |= ((r.z >> (2 * i + 1)) & 1) << i
            b |= ((r.z >> (2 * i)) & 1) << i
        assert (a, b) == (r.a, r.b)
