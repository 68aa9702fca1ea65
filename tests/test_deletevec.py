"""DeletionVectorTable: merge-on-read deletes (sources/deletevec.py).

Pins: reads equal a predicate-filtered plain scan after any sequence of
delete batches; vectors accumulate across batches and versions commit
atomically; deletes never rewrite data files (inode check); compaction
folds the vector in without changing the answer; the anti-join
broadcasts the vector."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from tipoca_stream_spark.sources.deletevec import DeletionVectorTable


@pytest.fixture()
def table(spark, sf_dir, tmp_path):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    t = DeletionVectorTable(spark, str(tmp_path / "li"))
    t.write(li, n_files=4)
    return t, li


def test_delete_then_read_matches_filtered_scan(spark, table):
    t, li = table
    n = t.delete_where(F.col("l_returnflag") == "R")
    want = li.filter(F.col("l_returnflag") != "R")
    assert n == li.filter(F.col("l_returnflag") == "R").count()
    assert t.read().count() == want.count()
    got = t.read().groupBy("l_returnflag").count().collect()
    assert all(r["l_returnflag"] != "R" for r in got)


def test_deletes_accumulate_across_batches(spark, table):
    t, li = table
    t.delete_where(F.col("l_returnflag") == "R")
    t.delete_where((F.col("l_linestatus") == "F") & (F.col("l_quantity") > 45))
    surviving = li.filter(
        (F.col("l_returnflag") != "R")
        & ~((F.col("l_linestatus") == "F") & (F.col("l_quantity") > 45))
    )
    assert t.read().count() == surviving.count()
    # overlapping re-delete marks nothing new
    assert t.delete_where(F.col("l_returnflag") == "R") == 0


def test_delete_touches_no_data_file(spark, table):
    t, _ = table
    before = {f: os.stat(f).st_mtime_ns for f in glob.glob(t.path + "/part-*")}
    t.delete_where(F.col("l_quantity") > 10)
    after = {f: os.stat(f).st_mtime_ns for f in glob.glob(t.path + "/part-*")}
    assert before == after, "delete_where must be metadata-only"


def test_compact_preserves_answer_and_resets_vector(spark, table):
    t, li = table
    t.delete_where(F.col("l_returnflag") == "R")
    want = sorted(
        (r["l_orderkey"], r["l_linenumber"])
        for r in t.read().select("l_orderkey", "l_linenumber").collect()
    )
    t.compact(n_files=2)
    assert t.deleted_count() == 0
    got = sorted(
        (r["l_orderkey"], r["l_linenumber"])
        for r in t.read().select("l_orderkey", "l_linenumber").collect()
    )
    assert got == want
    assert len(glob.glob(t.path + "/part-*")) <= 2 + 1  # n_files (+_SUCCESS-safe glob slack)


def test_read_plans_broadcast_anti_join(spark, table):
    t, _ = table
    t.delete_where(F.col("l_quantity") > 40)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        t.read().explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_empty_vector_reads_everything(spark, table):
    t, li = table
    assert t.read().count() == li.count()
    assert t.deleted_count() == 0


def test_auto_compact_soak_bounds_read_amplification(spark, tmp_path):
    """VERDICT r5 worklist #7: a long interleaved delete soak with the
    auto-compaction policy on. Pins the cost model, not just the answer:
    the files a read touches (data parts + vector parts) stay bounded by
    a constant across 30 delete batches — the vector can never exceed the
    threshold for long, and each fold returns the data to n_files — and
    the final read still equals the predicate-filtered oracle.

    Measured policy note (local[8], 3k rows, n_files=4): threshold 60 ≈
    fold every ~4 batches; read amplification peaked at 6 files (4 data +
    2 vector versions) vs unbounded vector growth without the policy."""
    df = spark.range(3000).withColumn("grp", (F.col("id") % 100).cast("int"))
    t = DeletionVectorTable(
        spark, str(tmp_path / "soak"), auto_compact_threshold=60, n_files=4
    )
    t.write(df, n_files=4)

    def files_touched():
        data = len(glob.glob(os.path.join(t.path, "part-*.parquet")))
        dv = len(glob.glob(os.path.join(t.path, "_dv", "v*", "*.parquet")))
        return data, dv

    deleted: set[int] = set()
    peak = 0
    for i in range(30):
        lo, hi = i * 17, i * 17 + 16
        t.delete_where(F.col("id").between(lo, hi))
        deleted |= set(range(lo, min(hi + 1, 3000)))
        data, dv = files_touched()
        peak = max(peak, data + dv)
        # bounded read amplification: the policy caps BOTH components
        assert data <= 4
        assert dv <= 2  # current vector + one superseded (in-flight reads)
        assert t.deleted_count() < 60 + 17  # vector never outruns threshold
    assert t.compactions >= 5  # the policy actually fired, repeatedly
    assert peak <= 6
    survivors = {r["id"] for r in t.read().select("id").collect()}
    assert survivors == set(range(3000)) - deleted


def test_concurrent_delete_cannot_resurrect_rows(spark, tmp_path):
    """Two deleters racing on one table: the loser raises instead of
    flipping to a vector missing the winner's rows (which would silently
    RESURRECT erased records); its retry converges with BOTH delete sets
    applied."""
    from tipoca_stream_spark.sources.target import ConcurrentWriteError

    t = DeletionVectorTable(spark, str(tmp_path / "race"))
    t.write(spark.range(100), n_files=2)
    other = DeletionVectorTable(spark, str(tmp_path / "race"))

    # simulate the interleave deterministically: this deleter captures its
    # base (None — no deletes yet), then the other side commits, then this
    # delete reaches its CAS with the stale base and must lose
    orig = DeletionVectorTable._current_version
    calls = {"n": 0}

    def stale_base_then_real(self):
        calls["n"] += 1
        if calls["n"] == 1:
            # first call = base capture; the winner commits NOW
            other.delete_where(F.col("id") < 10)
            return orig(self) and None  # the base as read before the race
        return orig(self)

    DeletionVectorTable._current_version = stale_base_then_real
    try:
        with pytest.raises(ConcurrentWriteError):
            t.delete_where(F.col("id") >= 90)
    finally:
        DeletionVectorTable._current_version = orig

    # winner's deletes intact (no resurrection), loser's retry converges
    assert {r["id"] for r in t.read().collect()} == set(range(10, 100))
    t.delete_where(F.col("id") >= 90)
    assert {r["id"] for r in t.read().collect()} == set(range(10, 90))
