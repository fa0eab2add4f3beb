"""Z-order clustered layout: data round-trips exactly, and a 2-D box
predicate prunes MORE files (by parquet min-max stats) than a 1-D
sorted layout of the same data — the property the writer exists for."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from twitter_followers_patterns_mapreduce_spark.sources.writers import write_zordered, zvalue


def _file_ranges(path: str, cols: tuple[str, str]):
    """Per-file (min, max) of each column from parquet row-group stats."""
    out = []
    for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        rng = {}
        for c in cols:
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[c]).statistics
                mins.append(st.min)
                maxs.append(st.max)
            rng[c] = (min(mins), max(maxs))
        out.append(rng)
    return out


def _files_hit(ranges, box):
    (x0, x1), (y0, y1) = box
    n = 0
    for r in ranges:
        (amin, amax), (bmin, bmax) = r["a"], r["b"]
        if amax >= x0 and amin <= x1 and bmax >= y0 and bmin <= y1:
            n += 1
    return n


def test_zorder_prunes_2d_box_better_than_linear_sort(spark, tmp_path):
    # 64x64 grid, one row per cell — worst case for a 1-D sort layout
    df = spark.range(64 * 64).select(
        (F.col("id") % 64).cast("int").alias("a"),
        (F.col("id") / 64).cast("int").alias("b"),
        F.col("id").alias("payload"),
    )
    z_path, lin_path = str(tmp_path / "zorder"), str(tmp_path / "linear")
    write_zordered(df, z_path, "a", "b", n_files=16, bits=6)
    (
        df.repartitionByRange(16, F.col("a"))
        .sortWithinPartitions("a", "b")
        .write.mode("overwrite")
        .parquet(lin_path)
    )
    z_ranges = _file_ranges(z_path, ("a", "b"))
    lin_ranges = _file_ranges(lin_path, ("a", "b"))

    # the dimension a 1-D a-sort cannot prune at all: a b-only filter
    # hits EVERY a-striped file but only the z-quadrants whose b-range
    # intersects
    b_only = ((0, 63), (10, 17))
    assert _files_hit(lin_ranges, b_only) == len(lin_ranges)
    assert _files_hit(z_ranges, b_only) <= len(z_ranges) // 2

    # and a 2-D box still touches only a handful of z-quadrants
    box = ((10, 17), (10, 17))  # an 8x8 box = 64 of 4096 cells
    assert _files_hit(z_ranges, box) <= 4

    # layout never changes content
    got = spark.read.parquet(z_path)
    assert got.count() == 4096
    assert (
        got.where((F.col("a").between(10, 17)) & (F.col("b").between(10, 17))).count() == 64
    )


def test_zorder_benefit_estimate_matches_realized_file_pruning(spark, tmp_path):
    """Write-and-measure twin of the registered layout_zorder_benefit
    estimator (round-9 verdict item 5): materialize each layout's blocks
    as real parquet partitions, replay the SAME 1/8 x 1/8 probe against
    the files' actual min-max statistics, and pin that the estimator's
    n_blocks / blocks_touched / rows_scanned equal the realized numbers
    EXACTLY — the estimator replays pruning from per-block actual
    min/max, which is precisely what parquet footers store."""
    from pyspark.sql import functions as F

    from twitter_followers_patterns_mapreduce_spark.operators.planner import (
        _zb_cells,
        zorder_benefit_estimate,
    )

    bits = 3
    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_partkey", "l_suppkey"
    )
    est = {
        r["layout"]: r
        for r in zorder_benefit_estimate(
            df, "l_partkey", "l_suppkey", bits=bits
        ).collect()
    }

    base = df.selectExpr(
        "CAST(l_partkey AS BIGINT) AS x", "CAST(l_suppkey AS BIGINT) AS y"
    )
    stats_df = base.agg(
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
    )
    st = stats_df.first()
    cells = base.crossJoin(F.broadcast(stats_df)).selectExpr(
        "x", "y", *_zb_cells("spark", bits)
    )
    # the probe rectangle, re-derived with the estimator's arithmetic
    rx, ry = st["max_x"] - st["min_x"] + 1, st["max_y"] - st["min_y"] + 1
    x0, x1 = st["min_x"] + (rx * 2) // 8, st["min_x"] + (rx * 3) // 8
    y0, y1 = st["min_y"] + (ry * 2) // 8, st["min_y"] + (ry * 3) // 8

    for block_col, layout in (("block_lin", "linear_x"), ("block_z", "zorder")):
        path = str(tmp_path / layout)
        cells.select("x", "y", block_col).write.partitionBy(block_col).parquet(path)
        n_blocks = touched = rows_scanned = 0
        for d in sorted(glob.glob(os.path.join(path, f"{block_col}=*"))):
            mins = {"x": [], "y": []}
            maxs = {"x": [], "y": []}
            rows = 0
            for f in glob.glob(os.path.join(d, "part-*.parquet")):
                md = pq.ParquetFile(f).metadata
                rows += md.num_rows
                idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
                for c in ("x", "y"):
                    for rg in range(md.num_row_groups):
                        s = md.row_group(rg).column(idx[c]).statistics
                        mins[c].append(s.min)
                        maxs[c].append(s.max)
            n_blocks += 1
            hit = not (
                max(maxs["x"]) < x0
                or min(mins["x"]) >= x1
                or max(maxs["y"]) < y0
                or min(mins["y"]) >= y1
            )
            if hit:
                touched += 1
                rows_scanned += rows
        assert n_blocks == est[layout]["n_blocks"], layout
        assert touched == est[layout]["blocks_touched"], layout
        assert rows_scanned == est[layout]["rows_scanned"], layout

    # and the headline claim survives materialization: the z layout
    # touches a smaller row fraction than the linear layout
    assert est["zorder"]["rows_scanned"] < est["linear_x"]["rows_scanned"]


def test_zvalue_interleave_golden(spark):
    rows = spark.range(1).select(
        zvalue(F.lit(0b101), F.lit(0b011), bits=3).alias("z")
    ).collect()
    # x=101, y=011 → bits (y2 x2 y1 x1 y0 x0) = 0 1 1 0 1 1 = 27
    assert rows[0]["z"] == 0b011011
