"""CDC merge correctness (FIXTURES.md F7): last-write-wins replay oracle.

Covers the reference's merge order (load_processor.go:386-444): dedupe →
delete-common → drop DELETE rows → insert; append fast-path
(load_processor.go:774-781); randomized event sequences vs a pure-Python
replay oracle — the reference lacks these but its semantics make the oracle
trivial (SURVEY.md §5)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tipoca_stream_spark.operators.cdc import classify_operation, extract_row_image, skip_tombstones
from tipoca_stream_spark.operators.dedupe import latest_wins
from tipoca_stream_spark.operators.merge import (
    batch_event_counts,
    cdc_merge,
    merge_into_target,
    merge_with_offsets,
)

TARGET_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
])


def ev(id_, name, offset, op):
    return Row(id=id_, name=name, kafkaoffset=offset, debeziumop=op)


def batch_df(spark, events):
    schema = T.StructType(TARGET_SCHEMA.fields + [
        T.StructField("kafkaoffset", T.LongType()),
        T.StructField("debeziumop", T.StringType()),
    ])
    return spark.createDataFrame(events, schema)


def target_df(spark, rows):
    return spark.createDataFrame(rows, TARGET_SCHEMA)


def as_dict(df):
    return {r["id"]: r["name"] for r in df.collect()}


def test_dedupe_latest_wins_both_strategies(spark):
    b = batch_df(spark, [ev(1, "a", 10, "UPDATE"), ev(1, "b", 20, "UPDATE"), ev(2, "c", 5, "CREATE")])
    for strategy in ("max_by", "window"):
        out = latest_wins(b, ["id"], strategy=strategy)
        rows = {r["id"]: (r["name"], r["kafkaoffset"]) for r in out.collect()}
        assert rows == {1: ("b", 20), 2: ("c", 5)}


def test_merge_update_then_delete_same_pk(spark):
    # F7: UPDATE then DELETE of same PK in one batch → row absent
    t = target_df(spark, [Row(id=1, name="old")])
    b = batch_df(spark, [ev(1, "new", 10, "UPDATE"), ev(1, "new", 11, "DELETE")])
    assert as_dict(merge_into_target(t, b, ["id"])) == {}


def test_merge_delete_then_recreate_same_pk(spark):
    t = target_df(spark, [Row(id=1, name="old")])
    b = batch_df(spark, [ev(1, None, 10, "DELETE"), ev(1, "reborn", 11, "CREATE")])
    assert as_dict(merge_into_target(t, b, ["id"])) == {1: "reborn"}


def test_merge_delete_from_earlier_batch(spark):
    t = target_df(spark, [Row(id=1, name="keep"), Row(id=2, name="gone")])
    b = batch_df(spark, [ev(2, None, 100, "DELETE")])
    assert as_dict(merge_into_target(t, b, ["id"])) == {1: "keep"}


def test_append_fast_path(spark):
    # M6: only CREATE events → plain append, no merge (load_processor.go:774-781)
    t = target_df(spark, [Row(id=1, name="a")])
    b = batch_df(spark, [ev(2, "b", 10, "CREATE"), ev(3, "c", 11, "CREATE")])
    counts = batch_event_counts(b)
    assert counts == {"create": 2, "update": 0, "delete": 0}
    assert as_dict(cdc_merge(t, b, ["id"], counts)) == {1: "a", 2: "b", 3: "c"}


def test_batch_counts_mixed(spark):
    b = batch_df(spark, [ev(1, "a", 1, "CREATE"), ev(1, "b", 2, "UPDATE"), ev(1, None, 3, "DELETE")])
    assert batch_event_counts(b) == {"create": 1, "update": 1, "delete": 1}


def test_op_classification_and_row_image(spark):
    img = T.StructType([T.StructField("id", T.LongType()), T.StructField("name", T.StringType())])
    schema = T.StructType([
        T.StructField("before", img), T.StructField("after", img),
        T.StructField("offset", T.LongType()),
    ])
    df = spark.createDataFrame(
        [
            Row(before=None, after=Row(id=1, name="new"), offset=1),           # CREATE
            Row(before=Row(id=1, name="old"), after=Row(id=1, name="upd"), offset=2),  # UPDATE
            Row(before=Row(id=1, name="upd"), after=None, offset=3),           # DELETE
        ],
        schema,
    )
    out = extract_row_image(df).collect()
    assert [(r["debeziumop"], r["name"], r["kafkaoffset"]) for r in out] == [
        ("CREATE", "new", 1), ("UPDATE", "upd", 2), ("DELETE", "upd", 3),
    ]


def test_tombstone_skip(spark):
    df = spark.createDataFrame(
        [Row(key="k1", value=bytearray(b"x")), Row(key="k2", value=bytearray(b"")), Row(key="k3", value=None)],
        T.StructType([T.StructField("key", T.StringType()), T.StructField("value", T.BinaryType())]),
    )
    assert [r["key"] for r in skip_tombstones(df).collect()] == ["k1"]


def offset_target_df(spark, rows):
    schema = T.StructType(TARGET_SCHEMA.fields + [T.StructField("kafkaoffset", T.LongType())])
    return spark.createDataFrame(rows, schema)


def test_merge_with_offsets_out_of_order_batches(spark):
    # a CREATE batch arriving AFTER the UPDATE it logically precedes must
    # not clobber the newer row (the blind merge would)
    t = offset_target_df(spark, [Row(id=1, name="newer", kafkaoffset=10)])
    stale_create = batch_df(spark, [ev(1, "stale", 2, "CREATE"), ev(2, "b", 3, "CREATE")])
    out = {r["id"]: (r["name"], r["kafkaoffset"]) for r in
           merge_with_offsets(t, stale_create, ["id"]).collect()}
    assert out == {1: ("newer", 10), 2: ("b", 3)}


def test_merge_with_offsets_delete_and_update(spark):
    t = offset_target_df(spark, [Row(id=1, name="a", kafkaoffset=1), Row(id=2, name="b", kafkaoffset=2)])
    b = batch_df(spark, [ev(1, None, 5, "DELETE"), ev(2, "b2", 6, "UPDATE"), ev(3, "c", 7, "CREATE")])
    out = {r["id"]: (r["name"], r["kafkaoffset"]) for r in
           merge_with_offsets(t, b, ["id"]).collect()}
    assert out == {2: ("b2", 6), 3: ("c", 7)}


def test_merge_with_offsets_stale_delete_ignored(spark):
    t = offset_target_df(spark, [Row(id=1, name="live", kafkaoffset=20)])
    b = batch_df(spark, [ev(1, None, 5, "DELETE")])  # older than the live row
    out = {r["id"]: r["name"] for r in merge_with_offsets(t, b, ["id"]).collect()}
    assert out == {1: "live"}


def replay_oracle(initial: dict, events: list[tuple]) -> dict:
    """Pure-Python last-write-wins replay: events = (id, name, offset, op),
    applied in offset order."""
    state = dict(initial)
    for id_, name, _off, op in sorted(events, key=lambda e: e[2]):
        if op == "DELETE":
            state.pop(id_, None)
        else:
            state[id_] = name
    return state


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_randomized_replay_matches_oracle(spark, seed):
    rng = random.Random(seed)
    initial = {i: f"init{i}" for i in range(20)}
    events, offset = [], 0
    for _ in range(200):
        pk = rng.randrange(30)
        op = rng.choice(["CREATE", "UPDATE", "UPDATE", "DELETE"])
        events.append((pk, f"v{offset}" if op != "DELETE" else None, offset, op))
        offset += 1
    # split into 4 sequential batches, merge each
    t = target_df(spark, [Row(id=k, name=v) for k, v in initial.items()])
    for i in range(0, len(events), 50):
        chunk = [ev(*e) for e in events[i : i + 50]]
        t = cdc_merge(t, batch_df(spark, chunk), ["id"])
    assert as_dict(t) == replay_oracle(initial, events)
