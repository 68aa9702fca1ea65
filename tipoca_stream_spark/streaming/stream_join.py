"""Stream-stream joins with bounded state — event attribution as it
happens, without landing either side first.

The reference's topology joins nothing in flight (each topic lands in its
own Redshift table; the warehouse joins later). Structured Streaming can
join two live streams directly when both carry watermarks and the join
condition bounds the event-time distance between matched rows — that
bound is what lets the state store evict: a left row older than
``left.ts + upper < watermark`` can never match again and is dropped.
Without the time bound, stream-stream state grows forever; these helpers
make the bound mandatory.

State size is O(events inside the interval window per key), sharded by
the join key's hash across executors — the same scaling story as any
keyed aggregation. At 100 TB/day the interval (not the corpus) sizes the
state: a 1-hour attribution window holds an hour of keys, whatever the
table's history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "1 hour",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join right-stream rows landing within ``(left.ts, left.ts +
    max_delay]`` of a left-stream row with the same ``key`` — e.g. a
    purchase attributed to the click that preceded it by at most an hour.

    Both sides are watermarked ``watermark`` so Spark derives state
    eviction from the interval condition. ``how`` may be ``inner`` or
    ``left_outer`` (outer emits the unmatched left row only once its
    match window is fully below the watermark — late output is the price
    of a correct outer join on streams). Right columns are suffixed
    ``_r`` where they collide.
    """
    lw = left.withWatermark(left_ts, watermark).alias("l")
    collide = set(left.columns) & set(right.columns)
    r = right
    for c in collide:
        r = r.withColumnRenamed(c, f"{c}_r")
    rkey, rts = (f"{key}_r" if key in collide else key), (
        f"{right_ts}_r" if right_ts in collide else right_ts
    )
    rw = r.withWatermark(rts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{rkey}"))
        & (F.col(f"r.{rts}") > F.col(f"l.{left_ts}"))
        & (F.col(f"r.{rts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {max_delay}"))
    )
    return lw.join(rw, cond, how)


def dedupe_within_watermark(
    df: DataFrame, keys: list[str], ts_col: str, delay: str = "10 minutes"
) -> DataFrame:
    """Drop key-duplicates arriving within the watermark delay of each
    other — the lightweight engine-native alternative to the
    applyInPandasWithState dedup (streaming/stateful.py) when "replays
    arrive close together" is a safe assumption (Kafka redeliveries are;
    month-later backfills are not). State is one entry per key, evicted
    at the watermark — bounded without any custom state code."""
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)
