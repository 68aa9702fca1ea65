"""DeletionVectorTable: merge-on-read deletes (sources/deletevec.py).

Pins: reads equal a predicate-filtered plain scan after any sequence of
delete batches; vectors accumulate across batches and versions commit
atomically; deletes never rewrite data files (inode check); compaction
folds the vector in WITHOUT mutating anything in place (VERDICT r6
worklist #1) — a concurrent reader sees pre- or post-fold rows and never
a half-swapped directory, a crash between stage and flip leaves the old
state current, and a delete racing a fold loses the CAS instead of
applying old row positions to new files; the anti-join broadcasts the
vector."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from tipoca_stream_spark.sources.deletevec import DeletionVectorTable
from tipoca_stream_spark.sources.target import ConcurrentWriteError


def data_files(t: DeletionVectorTable) -> list[str]:
    """part-files of the CURRENT data version (resolved via the pointer)."""
    v = t._current_data_version()
    return sorted(glob.glob(os.path.join(t._data_path(v), "part-*")))


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
    before = {f: os.stat(f).st_mtime_ns for f in data_files(t)}
    t.delete_where(F.col("l_quantity") > 10)
    after = {f: os.stat(f).st_mtime_ns for f in data_files(t)}
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
    assert len(data_files(t)) <= 2


def test_compact_is_a_new_version_old_files_untouched(spark, table):
    """Nothing in-place: the fold lands in a brand-new d=<n> directory;
    every pre-fold file survives byte-identical (inode + mtime) until
    hygiene removes the superseded version — so a reader holding the old
    pointer resolution can never hit a missing or half-written file."""
    t, _ = table
    t.delete_where(F.col("l_returnflag") == "R")
    old_v = t._current_data_version()
    old = {f: os.stat(f).st_ino for f in data_files(t)}
    pre_fold = t.read()  # resolved against the OLD version
    pre_rows = pre_fold.count()
    t.compact(n_files=2)
    assert t._current_data_version() != old_v
    # old version intact (kept for in-flight scans) — same inodes, all present
    now = {f: os.stat(f).st_ino for f in sorted(glob.glob(os.path.join(t._data_path(old_v), "part-*")))}
    assert now == old
    # post-fold read answers identically
    assert t.read().count() == pre_rows


def test_compact_crash_between_stage_and_flip_leaves_old_state(spark, tmp_path):
    """Kill the fold after staging, before the pointer flip: the table
    still serves the pre-fold answer, and vacuum() collects the orphaned
    staged version a dead writer left behind (VERDICT r6 worklist #1+#2)."""
    t = DeletionVectorTable(spark, str(tmp_path / "crash"))
    t.write(spark.range(100), n_files=2)
    t.delete_where(F.col("id") < 20)
    state = t._state()

    orig = DeletionVectorTable._cas_flip

    def crash(self, *a, **k):
        raise RuntimeError("simulated crash between stage and flip")

    DeletionVectorTable._cas_flip = crash
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            t.compact(n_files=2)
    finally:
        DeletionVectorTable._cas_flip = orig

    # pointer never moved; the answer is the pre-fold answer
    assert t._state() == state
    assert {r["id"] for r in t.read().collect()} == set(range(20, 100))
    # the staged orphan (data version + its claim marker) is on disk...
    orphans = [
        d for d in os.listdir(t.path)
        if d.startswith("d=") and int(d.split("=", 1)[1]) != state[0]
    ]
    assert orphans, "crash should have left a staged data version behind"
    # ...and the janitor removes it (claim is 'stale' with ttl=0)
    removed = t.vacuum(claim_ttl_seconds=0.0)
    assert any(d.startswith("d=") for d in removed)
    assert not any(
        d.startswith("d=") and int(d.split("=", 1)[1]) != state[0]
        for d in os.listdir(t.path)
    )
    assert not any(d.startswith("_claim_d=") for d in os.listdir(t.path))
    # and a re-run fold succeeds normally
    t.compact(n_files=2)
    assert t.deleted_count() == 0
    assert {r["id"] for r in t.read().collect()} == set(range(20, 100))


def test_delete_racing_compact_loses_cas(spark, tmp_path):
    """A fold lands between a delete's base capture and its commit: the
    delete MUST lose — its vector is keyed on pre-fold (file, row_index)
    positions that mean nothing in the post-fold files; flipping it in
    would delete arbitrary wrong rows. The retry recomputes against the
    folded data and converges."""
    t = DeletionVectorTable(spark, str(tmp_path / "dvc"))
    t.write(spark.range(100), n_files=2)
    t.delete_where(F.col("id") < 10)
    other = DeletionVectorTable(spark, str(tmp_path / "dvc"))

    orig = DeletionVectorTable._current_version
    calls = {"n": 0}

    def base_then_fold(self):
        calls["n"] += 1
        if calls["n"] == 1:
            v = orig(self)  # capture the pre-fold base...
            other.compact(n_files=2)  # ...then the fold commits
            return v
        return orig(self)

    DeletionVectorTable._current_version = base_then_fold
    try:
        with pytest.raises(ConcurrentWriteError):
            t.delete_where(F.col("id") >= 90)
    finally:
        DeletionVectorTable._current_version = orig

    # fold held (vector reset, rows 0-9 gone for good), no stray deletes
    assert t.deleted_count() == 0
    assert {r["id"] for r in t.read().collect()} == set(range(10, 100))
    # the loser's retry converges against the folded table
    t.delete_where(F.col("id") >= 90)
    assert {r["id"] for r in t.read().collect()} == set(range(10, 90))


def test_sweep_never_touches_claimed_versions(spark, tmp_path):
    """ADVICE r6: the post-commit sweep must skip any vector version with
    a live claim marker — that directory belongs to a concurrent deleter
    mid-stage; deleting it under its feet would commit a pointer to a
    missing vector and resurrect erased rows."""
    t = DeletionVectorTable(spark, str(tmp_path / "claims"))
    t.write(spark.range(50), n_files=2)
    t.delete_where(F.col("id") < 5)
    # simulate a concurrent deleter mid-stage at v000009: claim + dir
    os.mkdir(t._dv_claim(9))
    os.makedirs(t._dv_path(9))
    with open(os.path.join(t._dv_path(9), "staged.parquet"), "w") as f:
        f.write("x")
    t.delete_where(F.col("id") >= 45)  # triggers the sweep
    assert os.path.isdir(t._dv_path(9)), "claimed staged vector was swept"
    assert os.path.isdir(t._dv_claim(9))
    os.remove(os.path.join(t._dv_path(9), "staged.parquet"))
    os.rmdir(t._dv_path(9))
    os.rmdir(t._dv_claim(9))


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
        data = len(data_files(t))
        dv_v = t._current_version()
        dv = (
            0
            if dv_v is None
            else len(glob.glob(os.path.join(t._dv_path(dv_v), "*.parquet")))
        )
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
        assert dv <= 1  # one coalesced cumulative vector serves the read
        assert t.deleted_count() < 60 + 17  # vector never outruns threshold
    assert t.compactions >= 5  # the policy actually fired, repeatedly
    assert peak <= 5
    survivors = {r["id"] for r in t.read().select("id").collect()}
    assert survivors == set(range(3000)) - deleted


def test_concurrent_delete_cannot_resurrect_rows(spark, tmp_path):
    """Two deleters racing on one table: the loser raises instead of
    flipping to a vector missing the winner's rows (which would silently
    RESURRECT erased records); its retry converges with BOTH delete sets
    applied."""
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
