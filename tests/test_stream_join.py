"""Stream-stream interval join + watermark dedup, driven through real
multi-micro-batch file streams (maxFilesPerTrigger=1 so state genuinely
crosses batches; distinct mtimes keep batch order deterministic)."""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import types as T

from tipoca_stream_spark.streaming.stream_join import (
    dedupe_within_watermark,
    stream_interval_join,
)

CLICK_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("click_id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)
BUY_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("order_id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _write(path, rows, seq):
    path.mkdir(parents=True, exist_ok=True)
    p = path / f"{seq:04d}_{uuid.uuid4().hex}.json"
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.utime(p, (1_700_000_000 + seq * 60, 1_700_000_000 + seq * 60))


def test_interval_join_attributes_within_window(spark, tmp_path):
    clicks_dir, buys_dir = tmp_path / "clicks", tmp_path / "buys"
    _write(clicks_dir, [
        {"user_id": 1, "click_id": "c1", "ts": "2024-01-01T10:00:00Z"},
        {"user_id": 2, "click_id": "c2", "ts": "2024-01-01T10:05:00Z"},
    ], 0)
    _write(buys_dir, [
        {"user_id": 1, "order_id": "o1", "ts": "2024-01-01T10:30:00Z"},  # in window
        {"user_id": 2, "order_id": "o2", "ts": "2024-01-01T12:00:00Z"},  # too late
        {"user_id": 3, "order_id": "o3", "ts": "2024-01-01T10:10:00Z"},  # no click
    ], 0)
    clicks = spark.readStream.schema(CLICK_SCHEMA).option("maxFilesPerTrigger", 1).json(str(clicks_dir))
    buys = spark.readStream.schema(BUY_SCHEMA).option("maxFilesPerTrigger", 1).json(str(buys_dir))
    joined = stream_interval_join(
        clicks, buys, key="user_id", left_ts="ts", right_ts="ts", max_delay="1 hour"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName(f"sj_{uuid.uuid4().hex[:8]}")
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(f"select click_id, order_id from {q.name}").collect()
    assert {(r[0], r[1]) for r in rows} == {("c1", "o1")}


def test_interval_join_state_crosses_batches(spark, tmp_path):
    clicks_dir, buys_dir = tmp_path / "clicks", tmp_path / "buys"
    _write(clicks_dir, [{"user_id": 1, "click_id": "c1", "ts": "2024-01-01T10:00:00Z"}], 0)
    # purchase arrives in a LATER micro-batch than its click
    _write(buys_dir, [{"user_id": 9, "order_id": "ox", "ts": "2024-01-01T09:00:00Z"}], 0)
    _write(buys_dir, [{"user_id": 1, "order_id": "o1", "ts": "2024-01-01T10:20:00Z"}], 1)
    clicks = spark.readStream.schema(CLICK_SCHEMA).option("maxFilesPerTrigger", 1).json(str(clicks_dir))
    buys = spark.readStream.schema(BUY_SCHEMA).option("maxFilesPerTrigger", 1).json(str(buys_dir))
    joined = stream_interval_join(
        clicks, buys, key="user_id", left_ts="ts", right_ts="ts", max_delay="1 hour"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName(f"sj_{uuid.uuid4().hex[:8]}")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(f"select click_id, order_id from {q.name}").collect()
    assert {(r[0], r[1]) for r in rows} == {("c1", "o1")}


def test_dedupe_within_watermark_drops_close_replays(spark, tmp_path):
    src = tmp_path / "src"
    _write(src, [
        {"user_id": 1, "click_id": "a", "ts": "2024-01-01T10:00:00Z"},
        {"user_id": 1, "click_id": "a", "ts": "2024-01-01T10:00:05Z"},  # replay
    ], 0)
    _write(src, [
        {"user_id": 1, "click_id": "a", "ts": "2024-01-01T10:01:00Z"},  # replay, next batch
        {"user_id": 1, "click_id": "b", "ts": "2024-01-01T10:02:00Z"},
    ], 1)
    stream = spark.readStream.schema(CLICK_SCHEMA).option("maxFilesPerTrigger", 1).json(str(src))
    deduped = dedupe_within_watermark(stream, ["user_id", "click_id"], "ts", "10 minutes")
    q = (
        deduped.writeStream.format("memory")
        .queryName(f"dd_{uuid.uuid4().hex[:8]}")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(f"select click_id from {q.name}").collect()
    assert sorted(r[0] for r in rows) == ["a", "b"]
