"""Stateful streaming operators (applyInPandasWithState): cross-batch
latest-wins dedup and event-time gap sessionization. Multiple micro-batches
are forced with maxFilesPerTrigger=1 so state genuinely crosses batch
boundaries — the property the batch-mode operators can't exhibit."""

from __future__ import annotations

import json
import os
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tipoca_stream_spark.streaming.stateful import dedupe_across_batches, sessionize_stateful

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("kafkaoffset", T.LongType()),
    ]
)


def _write_batch(path, rows, seq=0):
    # distinct, increasing mtimes — FileStreamSource orders files by
    # timestamp, and equal mtimes make batch order nondeterministic
    path.mkdir(parents=True, exist_ok=True)
    p = path / f"{seq:04d}_{uuid.uuid4().hex}.json"
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.utime(p, (1_700_000_000 + seq * 60, 1_700_000_000 + seq * 60))


def _run_stream(spark, src_dir, tmp_path, build, n_files):
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src_dir))
    )
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName(f"mem_{uuid.uuid4().hex[:8]}")
        .option("checkpointLocation", str(tmp_path / "ckpt" / uuid.uuid4().hex))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {q.name}")


def test_dedupe_across_batches_suppresses_replays(spark, tmp_path):
    src = tmp_path / "src"
    # batch 1: two versions of pk=1, one of pk=2
    _write_batch(src, [
        {"id": 1, "name": "a0", "kafkaoffset": 0},
        {"id": 1, "name": "a1", "kafkaoffset": 1},
        {"id": 2, "name": "b0", "kafkaoffset": 2},
    ], seq=0)
    # batch 2: replay of offset 1 (duplicate), stale offset 0, and a real update
    _write_batch(src, [
        {"id": 1, "name": "a1", "kafkaoffset": 1},
        {"id": 2, "name": "b0-stale", "kafkaoffset": 0},
        {"id": 1, "name": "a3", "kafkaoffset": 3},
    ], seq=1)
    out = _run_stream(
        spark, src, tmp_path, lambda s: dedupe_across_batches(s, ["id"]), 2
    ).collect()
    emitted = {(r["id"], r["kafkaoffset"]): r["name"] for r in out}
    # batch1 emits the per-batch winners; batch2 emits only the new winner for pk=1
    assert emitted == {(1, 1): "a1", (2, 2): "b0", (1, 3): "a3"}


def test_dedupe_emits_nothing_for_fully_stale_batch(spark, tmp_path):
    src = tmp_path / "src"
    _write_batch(src, [{"id": 7, "name": "x", "kafkaoffset": 10}], seq=0)
    _write_batch(src, [{"id": 7, "name": "x", "kafkaoffset": 10},
                       {"id": 7, "name": "old", "kafkaoffset": 4}], seq=1)
    out = _run_stream(
        spark, src, tmp_path, lambda s: dedupe_across_batches(s, ["id"]), 2
    ).collect()
    assert [(r["id"], r["kafkaoffset"]) for r in out] == [(7, 10)]


SESS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def test_sessionize_stateful_gap_split(spark, tmp_path):
    src = tmp_path / "sess_src"
    hour = 3600 * 1000
    base = 10 * hour  # ts=0 rows are dropped as late vs the initial watermark
    # user 1: two sessions separated by a 2h gap; user 2: one session
    src.mkdir(parents=True, exist_ok=True)
    batches = [
        [{"user_id": 1, "ts_ms": base, "value": 1.0},
         {"user_id": 1, "ts_ms": base + 60_000, "value": 2.0},
         {"user_id": 2, "ts_ms": base, "value": 5.0}],
        [{"user_id": 1, "ts_ms": base + 2 * hour + 120_000, "value": 3.0}],
        # far-future events advance the watermark past every open session
        [{"user_id": 99, "ts_ms": base + 100 * hour, "value": 0.0}],
        [{"user_id": 98, "ts_ms": base + 200 * hour, "value": 0.0}],
    ]
    for i, rows in enumerate(batches):
        _write_batch(src, rows, seq=i)

    stream = (
        spark.readStream.schema(SESS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
        .withWatermark("ts", "1 second")
    )
    q = (
        sessionize_stateful(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName(f"sess_{uuid.uuid4().hex[:8]}")
        .option("checkpointLocation", str(tmp_path / "ckpt" / uuid.uuid4().hex))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(f"select * from {q.name}").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    s1 = sorted(by_user.get(1, []), key=lambda r: r["session_start"])
    assert len(s1) == 2
    assert s1[0]["n_events"] == 2 and s1[0]["total_value"] == pytest.approx(3.0)
    assert s1[1]["n_events"] == 1 and s1[1]["total_value"] == pytest.approx(3.0)
    assert len(by_user.get(2, [])) == 1 and by_user[2][0]["total_value"] == pytest.approx(5.0)


def test_dedupe_state_survives_restart(spark, tmp_path):
    """State-store recovery: stop the query after batch 1, restart from the
    same checkpoint for batch 2 — the per-key high-water offsets must
    persist, so a replayed event is suppressed across the restart."""
    src = tmp_path / "restart_src"
    out = str(tmp_path / "restart_out")
    ckpt = str(tmp_path / "restart_ckpt")

    def run_once():
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        q = (
            dedupe_across_batches(stream, ["id"])
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write_batch(src, [{"id": 1, "name": "v1", "kafkaoffset": 5}], seq=0)
    run_once()  # first query instance: emits (1, 5), then terminates

    # second instance, same checkpoint: replay of offset 5 + a real update
    _write_batch(src, [{"id": 1, "name": "v1", "kafkaoffset": 5},
                       {"id": 1, "name": "v2", "kafkaoffset": 9}], seq=1)
    run_once()

    rows = sorted(
        (r["id"], r["kafkaoffset"], r["name"])
        for r in spark.read.parquet(out).collect()
    )
    # offset 5 emitted once (before restart), offset 9 after; the replayed
    # offset-5 event was suppressed by recovered state
    assert rows == [(1, 5, "v1"), (1, 9, "v2")]


def test_sessionize_late_event_merges_into_buffered_session(spark, tmp_path):
    """An in-batch gap must NOT eagerly emit: with a 2h watermark delay, the
    gap-closed session stays buffered, a late event from the next micro-batch
    lands inside its window, bridges it with the following session, and
    exactly ONE merged session is emitted once the watermark passes."""
    src = tmp_path / "late_src"
    hour = 3600 * 1000
    base = 10 * hour
    src.mkdir(parents=True, exist_ok=True)
    batches = [
        # session A [10:00, 10:05], then 10:40 (35min gap > 30min -> A closes
        # in-batch, but its expiry 10:35 is ahead of the lagging watermark)
        [{"user_id": 1, "ts_ms": base, "value": 1.0},
         {"user_id": 1, "ts_ms": base + 5 * 60_000, "value": 1.0},
         {"user_id": 1, "ts_ms": base + 40 * 60_000, "value": 1.0}],
        # late event at 10:10 — inside A's window; extends A to 10:10, whose
        # gap now reaches 10:40 -> bridges A and B into one session
        [{"user_id": 1, "ts_ms": base + 10 * 60_000, "value": 1.0}],
        # far-future events advance the watermark past everything
        [{"user_id": 99, "ts_ms": base + 100 * hour, "value": 0.0}],
        [{"user_id": 98, "ts_ms": base + 200 * hour, "value": 0.0}],
    ]
    for i, rows in enumerate(batches):
        _write_batch(src, rows, seq=i)

    stream = (
        spark.readStream.schema(SESS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
        .withWatermark("ts", "2 hours")
    )
    q = (
        sessionize_stateful(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName(f"late_{uuid.uuid4().hex[:8]}")
        .option("checkpointLocation", str(tmp_path / "ckpt" / uuid.uuid4().hex))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = [r for r in spark.sql(f"select * from {q.name}").collect() if r["user_id"] == 1]
    assert len(rows) == 1  # one merged session, no overlapping duplicate
    r = rows[0]
    assert r["n_events"] == 4
    assert int(r["session_start"].timestamp() * 1000) == base
    assert int(r["session_end"].timestamp() * 1000) == base + 40 * 60_000
    assert r["total_value"] == pytest.approx(4.0)


def test_native_windowed_agg_with_watermark_drops_late(spark, tmp_path):
    """The built-in Structured Streaming shape (window + watermark, append
    mode): windows emit once the watermark passes their end, and an event
    older than the watermark delay is dropped instead of mutating an
    already-emitted window. Spark filters late rows with the PREVIOUS
    batch's watermark (the two-watermark design of SPARK-24699), so the
    drop needs one more advancing batch between the window's close and the
    late arrival."""
    src = tmp_path / "wagg_src"
    src.mkdir(parents=True, exist_ok=True)
    hour = 3600 * 1000
    base = 10 * hour
    batches = [
        [{"user_id": 1, "ts_ms": base + 5 * 60_000, "value": 1.0},
         {"user_id": 1, "ts_ms": base + 10 * 60_000, "value": 2.0}],
        # advances the eviction watermark past 11:00 -> closes [10:00,11:00)
        [{"user_id": 1, "ts_ms": base + 2 * hour, "value": 4.0}],
        # advances the LATE-FILTER watermark past 11:00 as well
        [{"user_id": 1, "ts_ms": base + 3 * hour, "value": 8.0}],
        # late event for the closed window: below the filter watermark -> dropped
        [{"user_id": 1, "ts_ms": base + 20 * 60_000, "value": 100.0}],
        [{"user_id": 99, "ts_ms": base + 100 * hour, "value": 0.0}],
    ]
    for i, rows in enumerate(batches):
        _write_batch(src, rows, seq=i)

    stream = (
        spark.readStream.schema(SESS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
        .withWatermark("ts", "10 seconds")
    )
    agg = (
        stream.groupBy(F.window("ts", "1 hour"), F.col("user_id"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .select(F.col("window.start").alias("ws"), "user_id", "n", "total")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(f"wagg_{uuid.uuid4().hex[:8]}")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt" / uuid.uuid4().hex))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = [r for r in spark.sql(f"select * from {q.name}").collect() if r["user_id"] == 1]
    first_hour = [r for r in rows if int(r["ws"].timestamp() * 1000) == base]
    assert len(first_hour) == 1
    assert first_hour[0]["n"] == 2  # the late 100.0 event did NOT get in
    assert first_hour[0]["total"] == pytest.approx(3.0)


# --- vectorized fold ≡ per-row fold (round-5: stateful.py iterrows removal) ---

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tipoca_stream_spark.streaming.stateful import _fold_batch, _fold_event


def _fold_per_row(sessions, ts_ms, vals, gap_ms):
    """The pre-round-5 semantics: fold one event at a time."""
    sessions = [list(s) for s in sessions]
    for t, v in zip(ts_ms, vals):
        _fold_event(sessions, int(t), float(v), gap_ms)
    return sessions


_session_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),
        st.integers(min_value=0, max_value=2_000),
        st.integers(min_value=1, max_value=5),
        st.floats(min_value=-100, max_value=100, allow_nan=False),
    ),
    max_size=4,
)


@settings(max_examples=300, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12_000),
            st.floats(min_value=-100, max_value=100, allow_nan=False),
        ),
        max_size=40,
    ),
    raw_sessions=_session_strategy,
    gap_ms=st.integers(min_value=1, max_value=3_000),
)
def test_fold_batch_equals_per_row_fold(events, raw_sessions, gap_ms):
    # build a VALID state list: pairwise gap-separated [start,end,n,tot]
    sessions = []
    cursor = 0
    for start_off, length, n, tot in sorted(raw_sessions):
        start = cursor + start_off
        end = start + length
        sessions.append([start, end, n, tot])
        cursor = end + gap_ms + 1  # next session strictly out of gap reach
    ts_ms = np.array(sorted(t for t, _ in events), dtype=np.int64)
    by_t = sorted(events)
    vals = np.array([v for _, v in by_t], dtype=float)

    got = _fold_batch(sessions, ts_ms, vals, gap_ms)
    want = _fold_per_row(sessions, ts_ms, vals, gap_ms)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1] and g[2] == w[2]
        assert math.isclose(g[3], w[3], rel_tol=1e-9, abs_tol=1e-9)


def test_fold_batch_hot_key_speed():
    """1M-event hot key folds in well under a second (the iterrows fold
    took tens of seconds at this size) — a smoke bound, not a benchmark."""
    import time

    rng = np.random.default_rng(7)
    ts = np.sort(rng.integers(0, 10_000_000, size=1_000_000)).astype(np.int64)
    vals = rng.random(1_000_000)
    t0 = time.perf_counter()
    out = _fold_batch([], ts, vals, gap_ms=50)
    dt = time.perf_counter() - t0
    assert sum(s[2] for s in out) == 1_000_000
    assert math.isclose(sum(s[3] for s in out), float(vals.sum()), rel_tol=1e-6)
    assert dt < 2.0, f"vectorized fold took {dt:.2f}s"
