"""Z-order layout: rectangle reads must prune files on EVERY curve
dimension (where a single-column range layout prunes on one), and always
return exactly what a full-scan filter would."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from tipoca_stream_spark.sources.zonemap import ZoneMappedTable
from tipoca_stream_spark.sources.zorder import ZOrderedTable, morton_key, quantize


def test_morton_interleave_golden(spark):
    # x bits land at even positions, y bits at odd: x=0b11, y=0b01 -> 0b0111
    df = spark.range(1).select(
        morton_key([F.lit(3), F.lit(1)], bits=2).alias("z"),
        morton_key([F.lit(0), F.lit(3)], bits=2).alias("z2"),
        morton_key([F.lit(5), F.lit(0)], bits=4).alias("z3"),
    )
    row = df.first()
    assert row["z"] == 0b0111
    assert row["z2"] == 0b1010
    assert row["z3"] == 0b010001  # 5=0b101 spread to positions 0,2,4


def test_quantize_bounds_and_degenerate(spark):
    df = spark.range(1).select(
        quantize(F.lit(5.0), F.lit(0.0), F.lit(10.0), bits=4).alias("mid"),
        quantize(F.lit(0.0), F.lit(0.0), F.lit(10.0), bits=4).alias("lo"),
        quantize(F.lit(10.0), F.lit(0.0), F.lit(10.0), bits=4).alias("hi"),
        quantize(F.lit(7.0), F.lit(7.0), F.lit(7.0), bits=4).alias("flat"),
        quantize(F.lit(-3.0), F.lit(0.0), F.lit(10.0), bits=4).alias("clamp"),
    )
    row = df.first()
    assert row["mid"] == 7 and row["lo"] == 0 and row["hi"] == 15
    assert row["flat"] == 0 and row["clamp"] == 0


def _grid(spark, n=128):
    # a uniform 2-d grid: every (x, y) cell occupied, worst case for a
    # single-column layout's second dimension
    return spark.range(n * n).select(
        F.col("id").alias("row_id"),
        (F.col("id") % n).alias("x"),
        (F.col("id") / n).cast("long").alias("y"),
    )


def test_rectangle_read_prunes_both_dims_and_matches_full_scan(
    spark, tmp_path
):
    df = _grid(spark)
    t = ZOrderedTable(spark, str(tmp_path / "z"), cols=["x", "y"])
    t.write(df, n_files=16)
    n_files = len(glob.glob(str(tmp_path / "z" / "*.parquet")))
    assert n_files == 16

    got = t.read_box({"x": (10, 30), "y": (10, 30)})
    assert 0 < len(set(got.inputFiles())) < n_files
    want = sorted(
        r["row_id"]
        for r in df.filter(
            F.col("x").between(10, 30) & F.col("y").between(10, 30)
        ).collect()
    )
    assert sorted(r["row_id"] for r in got.collect()) == want and want


def test_zorder_beats_single_column_layout_on_second_dim(spark, tmp_path):
    df = _grid(spark)
    n_files = 16
    zt = ZOrderedTable(spark, str(tmp_path / "zt"), cols=["x", "y"])
    zt.write(df, n_files=n_files)
    rt = ZoneMappedTable(
        spark, str(tmp_path / "rt"), zone_col="x", extra_cols=["y"]
    )
    rt.write(df, n_files=n_files)

    box = {"x": (0, 127), "y": (0, 15)}  # selective only on the SECOND dim
    z_files = len(set(zt.read_box(box).inputFiles()))
    r_files = len(set(rt.read_box(box).inputFiles()))
    # range layout on x has global-wide y zones -> scans everything;
    # the curve layout keeps y zones tight too
    assert r_files == n_files
    assert z_files < n_files // 2, (z_files, r_files)
    # and both return the identical (correct) rows
    assert zt.read_box(box).count() == rt.read_box(box).count() > 0


def test_single_dim_read_range_still_works_on_curve(spark, tmp_path):
    df = _grid(spark, n=64)
    t = ZOrderedTable(spark, str(tmp_path / "z1"), cols=["x", "y"])
    t.write(df, n_files=8)
    got = t.read_range(0, 7, col="x")
    assert 0 < len(set(got.inputFiles())) <= 8
    assert got.count() == df.filter(F.col("x").between(0, 7)).count()


def test_read_box_untracked_column_residual_filter(spark, tmp_path):
    df = _grid(spark, n=32)
    t = ZOrderedTable(spark, str(tmp_path / "z2"), cols=["x", "y"])
    t.write(df, n_files=4)
    got = t.read_box({"x": (0, 10), "row_id": (0, 99)})
    want = df.filter(
        F.col("x").between(0, 10) & F.col("row_id").between(0, 99)
    ).count()
    assert got.count() == want and want > 0


def test_empty_box_reads_nothing(spark, tmp_path):
    df = _grid(spark, n=32)
    t = ZOrderedTable(spark, str(tmp_path / "z3"), cols=["x", "y"])
    t.write(df, n_files=4)
    assert t.read_box({"x": (10_000, 20_000)}).count() == 0
