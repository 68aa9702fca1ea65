"""SCD2 history semantics: versions become validity intervals, deletes
close intervals without emitting rows, and the open versions equal
latest-wins dedupe minus deleted keys."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from tipoca_stream_spark.operators.dedupe import latest_wins
from tipoca_stream_spark.operators.scd2 import current_rows, scd2_history

SCHEMA = "pk long, ts timestamp, op string, v string, seq long"


def t(s):
    return datetime(2026, 1, 1, 0, 0, s)


ROWS = [
    # pk 1: create, update, update — full history, last version open
    (1, t(1), "c", "a", 1),
    (1, t(2), "u", "b", 2),
    (1, t(3), "u", "c", 3),
    # pk 2: create then delete — one closed interval, no open row
    (2, t(1), "c", "x", 4),
    (2, t(5), "d", None, 5),
    # pk 3: delete then re-create (Debezium re-insert after delete)
    (3, t(1), "c", "m", 6),
    (3, t(2), "d", None, 7),
    (3, t(4), "c", "n", 8),
    # pk 4: two changes with EQUAL ts — seq (kafkaoffset) breaks the tie
    (4, t(6), "c", "p", 9),
    (4, t(6), "u", "q", 10),
]


def history(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    return scd2_history(df, key_col="pk", ts_col="ts", op_col="op",
                        value_cols=["v"], seq_col="seq")


def test_intervals_and_deletes(spark):
    h = {(r["pk"], r["v"]): (r["valid_from"], r["valid_to"]) for r in history(spark).collect()}
    assert h[(1, "a")] == (t(1), t(2))
    assert h[(1, "b")] == (t(2), t(3))
    assert h[(1, "c")] == (t(3), None)          # open
    assert h[(2, "x")] == (t(1), t(5))          # closed by the delete
    assert h[(3, "m")] == (t(1), t(2))          # closed by delete
    assert h[(3, "n")] == (t(4), None)          # re-created, open
    assert h[(4, "p")] == (t(6), t(6))          # zero-length, seq-ordered
    assert h[(4, "q")] == (t(6), None)
    assert len(h) == 8  # every non-delete input row becomes one interval


def test_no_delete_rows_emitted(spark):
    assert history(spark).filter(F.col("v").isNull()).count() == 0


def test_current_equals_latest_wins_minus_deletes(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    cur = {(r["pk"], r["v"]) for r in history(spark).filter(current_rows()).collect()}
    latest = latest_wins(df, keys=["pk"], order_col="seq")
    alive = {
        (r["pk"], r["v"]) for r in latest.collect() if r["op"] != "d"
    }
    assert cur == alive == {(1, "c"), (3, "n"), (4, "q")}
