"""BucketedTargetTable.append_delta — the O(batch) commit for append-only
tables (the incremental dedup indexes, VERDICT r7 wrong #1): writes ONLY
the new rows' bucket files, hard-links EVERY previous file, and keeps the
bucketed plan, the CAS protocol, and the zone/Bloom sidecars intact."""

from __future__ import annotations

import contextlib
import io
import os

import pytest
from pyspark.sql import functions as F

from tipoca_stream_spark.sources.target import (
    BucketedTargetTable,
    ConcurrentWriteError,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def _mk(spark, tmp_path, **kw):
    return BucketedTargetTable(
        spark, str(tmp_path), "apx", buckets=8, keys=["user_id"], **kw
    )


def _frame(spark, n, start=0):
    return spark.range(start, start + n).select(
        F.col("id").alias("user_id"), (F.col("id") * 2).cast("double").alias("value")
    )


def test_append_links_every_previous_file(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.write(_frame(spark, 1000))
    v1_inodes = {os.stat(f).st_ino for f in t._version_files(t._vdir(1))}
    t.append_delta(_frame(spark, 50, start=1000))
    v2_files = t._version_files(t._vdir(2))
    v2_inodes = {os.stat(f).st_ino for f in v2_files}
    # every v1 file rides into v2 by hard link — zero bytes rewritten
    assert v1_inodes <= v2_inodes
    assert t.last_commit_stats["files_linked"] == len(v1_inodes)
    # only the append's own files are new
    assert t.last_commit_stats["files_written"] == len(v2_inodes - v1_inodes)
    got = {r["user_id"]: r["value"] for r in t.read().collect()}
    assert len(got) == 1050 and got[1049] == 2098.0
    # old version still serves (time travel untouched)
    assert t.read(1).count() == 1000


def test_append_chain_write_cost_is_o_batch_not_o_table(spark, tmp_path):
    """The whole point: as the table grows over many appends, each commit
    writes files for the BATCH's buckets only — never re-reads or
    rewrites accumulated data. files_written stays bounded by the bucket
    count while the table grows 5x."""
    t = _mk(spark, tmp_path)
    t.write(_frame(spark, 500))
    writes = []
    for e in range(1, 5):
        t.append_delta(_frame(spark, 500, start=500 * e))
        writes.append(t.last_commit_stats["files_written"])
    assert t.read().count() == 2500
    # each append wrote at most one file per touched bucket — flat cost
    assert all(w <= 8 for w in writes)
    # and the linked share grows with the table (prior files all carried)
    assert t.last_commit_stats["files_linked"] >= sum(writes[:-1])


def test_appended_table_still_plans_bucketed(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.write(_frame(spark, 400))
    t.append_delta(_frame(spark, 100, start=400))
    plan = _plan(t.read().groupBy("user_id").agg(F.sum("value")))
    assert "Exchange" not in plan, plan
    # compact folds the append chain back to one file per bucket
    t.compact()
    assert len(t._version_files(t._vdir(t.current_version()))) == 8
    assert t.read().count() == 500


def test_append_cas_loser_leaves_no_trace(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.write(_frame(spark, 100))
    base = t.current_version()
    t.append_delta(_frame(spark, 10, start=100))  # someone else commits
    with pytest.raises(ConcurrentWriteError):
        t.append_delta(_frame(spark, 10, start=200), expected_base=base)
    assert t.read().count() == 110  # winner intact, loser gone
    assert t.versions() == [1, 2]


def test_append_bootstraps_empty_table(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append_delta(_frame(spark, 20), expected_base=None)
    assert t.read().count() == 20


def test_append_maintains_zone_and_bloom_sidecars(spark, tmp_path):
    t = BucketedTargetTable(
        spark,
        str(tmp_path),
        "apz",
        buckets=4,
        keys=["user_id"],
        zone_cols=["value"],
        bloom_col="tag",
    )
    d1 = spark.range(0, 200).select(
        F.col("id").alias("user_id"),
        F.col("id").cast("double").alias("value"),
        F.concat(F.lit("t"), F.col("id")).alias("tag"),
    )
    d2 = spark.range(200, 260).select(
        F.col("id").alias("user_id"),
        F.col("id").cast("double").alias("value"),
        F.concat(F.lit("t"), F.col("id")).alias("tag"),
    )
    t.write(d1)
    t.append_delta(d2)
    # bloom: only the append's files were hashed; lookups hit old AND new
    assert t.last_commit_stats["bloom_files_hashed"] == t.last_commit_stats[
        "files_written"
    ]
    assert t.read_point("t5", "tag").count() == 1
    assert t.read_point("t250", "tag").count() == 1
    old, new = t.point_files("t5", "tag"), t.point_files("t250", "tag")
    assert old and new
    # zones: range read over both halves schedules fewer files than a
    # full scan and answers exactly
    got = sorted(r["user_id"] for r in t.read_range(195.0, 205.0, "value").collect())
    assert got == list(range(195, 206))
    vdir = t._vdir(t.current_version())
    assert len(t.range_files(195.0, 205.0, "value")) < len(t._version_files(vdir))


def test_append_refuses_text_sidecar(spark, tmp_path):
    t = BucketedTargetTable(
        spark,
        str(tmp_path),
        "aptxt",
        buckets=4,
        keys=["doc_id"],
        text_col="body",
    )
    d = spark.createDataFrame([(1, "hello world")], "doc_id int, body string")
    t.write(d)
    with pytest.raises(NotImplementedError):
        t.append_delta(d)


def test_empty_base_and_empty_appends(spark, tmp_path):
    """Degenerate commits are legitimate (a filter chain can pass
    nothing): an EMPTY initial write, appends onto it, an EMPTY append
    onto a real table, and compaction across the mix all stay readable
    and correct."""
    t = _mk(spark, tmp_path)
    full = _frame(spark, 100)
    empty = full.filter(F.lit(False))
    t.write(empty)
    assert t.read().count() == 0
    t.append_delta(full)
    assert t.read().count() == 100
    t.append_delta(empty)
    assert t.read().count() == 100
    t.compact()
    assert t.read().count() == 100
