"""Rolling-median serving paths (operators/rolling.py, VERDICT r6
worklist #6): both the expression path (bounded-frame sort, small w) and
the order-statistic path (pandas skiplist via applyInPandas, wide w)
must hash-match the DuckDB windowed-median oracle at w ∈ {11, 101,
1001} — and the probe records the relative cost so EXPRESSION_MAX_W is
a measured crossover, not a guess."""

from __future__ import annotations

import time

import duckdb
import pytest

from tipoca_stream_spark.operators.rolling import rolling_median
from tipoca_stream_spark.sources.tables import load_table


def _oracle(sf_dir: str, w: int) -> dict[tuple[int, int], float]:
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT user_id, event_id,
               round(median(value) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id
                     ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW), 6) AS med
        FROM read_parquet('{sf_dir}/events.parquet')
        """
    ).fetchall()
    return {(u, e): m for u, e, m in rows}


@pytest.mark.parametrize("w", [11, 101, 1001])
def test_both_paths_match_duckdb_oracle(spark, sf_dir, w):
    ev = load_table(spark, sf_dir, "events")
    want = _oracle(sf_dir, w)
    timings = {}
    for method in ("expression", "order_statistic"):
        t0 = time.monotonic()
        got = {
            (r["user_id"], r["event_id"]): round(r["med"], 6)
            for r in rolling_median(
                ev, "user_id", ["ts", "event_id"], "value", w=w, method=method
            ).collect()
        }
        timings[method] = time.monotonic() - t0
        assert got == want, f"{method} path diverged from oracle at w={w}"
    # probe, not a gate (single-host timings drift): the skiplist path's
    # advantage should GROW with w — printed for the round notes
    print(
        f"\nrolling_median w={w}: expression={timings['expression']:.2f}s "
        f"order_statistic={timings['order_statistic']:.2f}s"
    )


def test_default_routing_picks_by_width(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    import io
    import contextlib

    # wide w must route to the pandas order-statistic serving path:
    # streaming MapInPandas by default, FlatMapGroupsInPandas when an
    # explicit chunk_rows opts into the chunked shape (round 14)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rolling_median(ev, "user_id", ["ts", "event_id"], "value", w=500).explain()
    assert "MapInPandas" in buf.getvalue()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rolling_median(
            ev, "user_id", ["ts", "event_id"], "value", w=500, chunk_rows=1 << 18
        ).explain()
    assert "FlatMapGroupsInPandas" in buf.getvalue()
    # small w stays JVM-side (window aggregate, no Python)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rolling_median(ev, "user_id", ["ts", "event_id"], "value", w=11).explain()
    plan = buf.getvalue()
    assert "FlatMapGroupsInPandas" not in plan and "Window" in plan


def test_null_frames_yield_null(spark):
    """A frame whose non-null values are empty must produce NULL on both
    paths (SQL median semantics), not 0 or NaN."""
    rows = [(1, i, None if i < 3 else float(i)) for i in range(6)]
    df = spark.createDataFrame(rows, "user_id int, event_id int, value double")
    for method in ("expression", "order_statistic"):
        got = {
            r["event_id"]: r["med"]
            for r in rolling_median(
                df, "user_id", ["event_id"], "value", w=2, method=method
            ).collect()
        }
        assert got[0] is None and got[1] is None and got[2] is None  # all-null frames
        assert got[3] == 3.0  # frame = {null, 3.0} — null skipped
        assert got[4] == 3.5  # frame = {3.0, 4.0} — even count, mean of middles


def test_chunked_equals_unchunked_property(spark):
    """The r7→r8 fix: the wide path shards one key's history into
    (chunk + w-1 warmup) pandas groups. Chunked with a TINY chunk size
    must equal unchunked exactly — including nulls, ties, and frames
    spanning chunk boundaries — on randomized data with a hot key."""
    import random

    rng = random.Random(8)
    rows = []
    for i in range(3000):  # hot key: one key holds 3000 rows
        v = None if rng.random() < 0.15 else round(rng.uniform(-50, 50), 3)
        rows.append((1, i, v))
    for i in range(200):  # a second, small key
        v = None if rng.random() < 0.15 else round(rng.uniform(-50, 50), 3)
        rows.append((2, i, v))
    df = spark.createDataFrame(rows, "user_id int, event_id int, value double")
    for w in (7, 64):
        kw = dict(method="order_statistic")
        unchunked = {
            (r["user_id"], r["event_id"]): r["med"]
            for r in rolling_median(
                df, "user_id", ["event_id"], "value", w=w,
                chunk_rows=10**9, **kw
            ).collect()
        }
        chunked = {
            (r["user_id"], r["event_id"]): r["med"]
            for r in rolling_median(
                df, "user_id", ["event_id"], "value", w=w,
                chunk_rows=w, **kw  # most hostile legal chunking: R == w
            ).collect()
        }
        assert chunked == unchunked, f"chunk boundary divergence at w={w}"
        assert len(chunked) == 3200

        # round 14: the default (chunk_rows=None) streaming mapInPandas
        # shape must match too — forced through TINY Arrow batches so a
        # key's history spans many batches and the warmup carry is
        # exercised (the hot key's 3000 rows cross ~47 boundaries)
        prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
        try:
            streamed = {
                (r["user_id"], r["event_id"]): r["med"]
                for r in rolling_median(
                    df, "user_id", ["event_id"], "value", w=w, **kw
                ).collect()
            }
        finally:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
        assert streamed == unchunked, f"stream boundary divergence at w={w}"


def test_hot_key_history_never_lands_in_one_pandas_group(spark):
    """Structural pin for the 100 TB story: with chunking engaged, the
    number of pandas groups for one hot key is ceil(n/R) (+ trailing
    warmup group), so no task holds the full history."""
    n, R, w = 1000, 100, 50
    df = spark.createDataFrame(
        [(1, i, float(i % 17)) for i in range(n)],
        "user_id int, event_id int, value double",
    )
    out = rolling_median(
        df, "user_id", ["event_id"], "value", w=w,
        method="order_statistic", chunk_rows=R,
    )
    assert out.count() == n
    # the grouping key is (part, _chunk): distinct chunks for the key
    # must be n/R, not 1
    from pyspark.sql import functions as F, Window

    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("event_id"))
    n_chunks = (
        df.withColumn("_rn", rn)
        .select(F.floor((F.col("_rn") - 1) / R).alias("c"))
        .distinct()
        .count()
    )
    assert n_chunks == n // R
