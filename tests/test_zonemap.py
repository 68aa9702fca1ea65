"""Zone-map skipping: a range read must open only overlapping files and
still return exactly the rows a full-scan filter would."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from tipoca_stream_spark.sources.tables import load_table
from tipoca_stream_spark.sources.zonemap import ZoneMappedTable

SF = "/root/testdata/sf0.001"


def test_range_read_skips_files_and_matches_full_scan(spark, tmp_path):
    t = ZoneMappedTable(spark, str(tmp_path / "ev"), zone_col="value")
    t.write(load_table(spark, SF, "events"), n_files=8)
    n_files = len(glob.glob(str(tmp_path / "ev" / "*.parquet")))
    assert n_files == 8

    got = t.read_range(10.0, 20.0)
    scanned = set(got.inputFiles())
    assert 0 < len(scanned) < n_files, (len(scanned), n_files)

    want = sorted(
        r["event_id"]
        for r in t.read().filter(F.col("value").between(10.0, 20.0)).collect()
    )
    assert sorted(r["event_id"] for r in got.collect()) == want and want


def test_empty_range_reads_nothing(spark, tmp_path):
    t = ZoneMappedTable(spark, str(tmp_path / "ev2"), zone_col="value")
    t.write(load_table(spark, SF, "events"), n_files=4)
    assert t.read_range(1e9, 2e9).count() == 0


def test_timestamp_zone_column(spark, tmp_path):
    t = ZoneMappedTable(spark, str(tmp_path / "ts"), zone_col="ts")
    ev = load_table(spark, SF, "events")
    t.write(ev, n_files=8)
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    mid = lo + (hi - lo) / 4
    got = t.read_range(lo, mid)
    assert 0 < len(set(got.inputFiles())) < 8
    want = ev.filter(F.col("ts").between(lo, mid)).count()
    assert got.count() == want and want > 0


def test_correlated_extra_column_also_skips(spark, tmp_path):
    # events.ts correlates with event_id in the testdata generator, so a
    # range predicate on the NON-layout column still prunes files
    t = ZoneMappedTable(spark, str(tmp_path / "ev3"), zone_col="ts", extra_cols=["event_id"])
    ev = load_table(spark, SF, "events")
    t.write(ev, n_files=8)
    lo = ev.agg(F.min("event_id")).first()[0]
    hi = lo + 100
    got = t.read_range(lo, hi, col="event_id")
    assert 0 < len(set(got.inputFiles())) < 8
    want = sorted(r["event_id"] for r in ev.filter(F.col("event_id").between(lo, hi)).collect())
    assert sorted(r["event_id"] for r in got.collect()) == want and want


def test_uncorrelated_column_still_correct(spark, tmp_path):
    # value does NOT correlate with the ts layout: pruning may keep every
    # file, but the result must still be exactly the filter's rows
    t = ZoneMappedTable(spark, str(tmp_path / "ev4"), zone_col="ts", extra_cols=["value"])
    ev = load_table(spark, SF, "events")
    t.write(ev, n_files=8)
    got = sorted(r["event_id"] for r in t.read_range(10.0, 20.0, col="value").collect())
    want = sorted(r["event_id"] for r in ev.filter(F.col("value").between(10.0, 20.0)).collect())
    assert got == want and want


def test_many_files_prunes_scheduling(spark, tmp_path):
    # 200 files: the stats table, not a driver dict, does the pruning —
    # a 0.5%-wide range must schedule a handful of files, and only the
    # matching paths ever reach the driver
    t = ZoneMappedTable(spark, str(tmp_path / "many"), zone_col="value")
    df = spark.range(20000).select(
        F.col("id").alias("event_id"), F.col("id").cast("double").alias("value")
    )
    t.write(df, n_files=200)
    n_files = len(glob.glob(str(tmp_path / "many" / "*.parquet")))
    assert n_files == 200
    got = t.read_range(1000.0, 1099.0)
    assert len(set(got.inputFiles())) <= 4, "pruning must schedule ~1% of files"
    assert got.count() == 100


def test_stats_live_in_parquet_not_driver_json(spark, tmp_path):
    t = ZoneMappedTable(spark, str(tmp_path / "st"), zone_col="value")
    t.write(load_table(spark, SF, "events"), n_files=4)
    assert not glob.glob(str(tmp_path / "st" / "_zones.json"))
    stats = spark.read.parquet(str(tmp_path / "st" / "_zones"))
    assert stats.count() == 4
    assert {"file", "min_value", "max_value"} <= set(stats.columns)
