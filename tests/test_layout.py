"""Z-order layout: multi-dimensional footer-stat pruning, measured on the
actual parquet min/max metadata the scan planner uses."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from funnel_report_etl_pipeline__spark.sources.layout import (
    with_zorder_key,
    write_zordered,
    zorder_key,
)

N = 1 << 14  # 16k points on a 128x128 grid
SIDE = 128
N_FILES = 64


@pytest.fixture(scope="module")
def grid(spark):
    # deterministic pseudo-random 2-D points: x from the id bits, y from a
    # multiplicative hash so (x, y) are independent-ish
    df = (
        spark.range(N)
        .withColumn("x", (F.col("id") % SIDE).cast("int"))
        .withColumn("y", ((F.col("id") * 2654435761) % SIDE).cast("int"))
        .withColumn("payload", F.col("id") * 2)
    )
    return df.cache()


def _files_overlapping(path: str, box: dict[str, tuple[int, int]]) -> tuple[int, int]:
    """(n_overlapping, n_total) from parquet footer column stats — the
    exact information file/row-group skipping consumes."""
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    n_hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        mins: dict[str, int] = {}
        maxs: dict[str, int] = {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                st = col.statistics
                if st is None or name not in box:
                    continue
                mins[name] = min(mins.get(name, st.min), st.min)
                maxs[name] = max(maxs.get(name, st.max), st.max)
        if all(
            name in mins and not (maxs[name] < lo or mins[name] > hi)
            for name, (lo, hi) in box.items()
        ):
            n_hit += 1
    return n_hit, len(files)


@pytest.fixture(scope="module")
def layouts(spark, grid, tmp_path_factory):
    base = tmp_path_factory.mktemp("layouts")
    linear = str(base / "linear_x")
    zorder = str(base / "zorder_xy")
    # baseline: the classic single-key clustered layout (sorted by x)
    grid.repartitionByRange(N_FILES, "x").sortWithinPartitions("x").write.mode(
        "overwrite"
    ).parquet(linear)
    write_zordered(grid, zorder, ["x", "y"], n_files=N_FILES, bits=7)
    return linear, zorder


def test_zorder_bounds_worst_dimension(layouts):
    linear, zorder = layouts
    x_band = {"x": (32, 47)}  # 1/8 of the x range
    y_band = {"y": (32, 47)}  # 1/8 of the y range

    lin_x, total = _files_overlapping(linear, x_band)
    lin_y, _ = _files_overlapping(linear, y_band)
    z_x, _ = _files_overlapping(zorder, x_band)
    z_y, _ = _files_overlapping(zorder, y_band)

    assert total == N_FILES
    # the sorted layout is perfect on its key and useless off it
    assert lin_x <= N_FILES // 4
    assert lin_y >= N_FILES * 3 // 4  # y-filter degenerates to ~full scan
    # z-order prunes BOTH dimensions: worst dimension stays bounded well
    # below the sorted layout's worst dimension
    assert max(z_x, z_y) <= N_FILES // 2
    assert max(z_x, z_y) < lin_y


def test_zorder_box_query_prunes_and_is_correct(spark, grid, layouts):
    linear, zorder = layouts
    box = {"x": (32, 47), "y": (96, 111)}  # 1/64 of the plane
    lin_hit, _ = _files_overlapping(linear, box)
    z_hit, _ = _files_overlapping(zorder, box)
    # the 2-D box is where z-order shines: compact key slabs cover it with
    # a handful of files
    assert z_hit <= lin_hit
    assert z_hit <= N_FILES // 4

    # and the layout is a pure reordering: same rows come back
    pred = (
        (F.col("x") >= 32) & (F.col("x") <= 47)
        & (F.col("y") >= 96) & (F.col("y") <= 111)
    )
    expect = sorted(r.payload for r in grid.filter(pred).collect())
    got = sorted(
        r.payload for r in spark.read.parquet(zorder).filter(pred).collect()
    )
    assert got == expect


def test_zorder_key_is_morton_interleave(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (3, 5)], "a int, b int"
    )
    out = df.select(
        zorder_key([F.col("a").cast("long"), F.col("b").cast("long")], 3).alias("z")
    ).collect()

    def morton(a, b):
        z = 0
        for i in range(3):
            z |= ((a >> i) & 1) << (2 * i + 1)
            z |= ((b >> i) & 1) << (2 * i)
        return z

    assert [r.z for r in out] == [morton(a, b) for a, b in
                                  [(0, 0), (1, 0), (0, 1), (1, 1), (3, 5)]]


def test_with_zorder_key_no_python_no_extra_shuffle(spark, grid):
    keyed = with_zorder_key(grid, ["x", "y"], bits=7)
    plan = keyed._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # stats row is broadcast, not shuffled onto the data
    assert "Exchange hashpartitioning" not in plan
