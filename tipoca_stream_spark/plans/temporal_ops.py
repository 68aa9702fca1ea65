"""Temporal/stream-analysis queries: as-of join, gap sessionization,
rolling hash — the "operators Spark lacks, composed from built-ins" family
(SURVEY.md §7 custom-operator guidance). DuckDB oracles use its native
ASOF JOIN and list_reduce, so the compositions are checked against an
independent implementation, not a re-statement of themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tipoca_stream_spark.operators.asof import asof_join
from tipoca_stream_spark.operators.text import ROLLING_BASE, ROLLING_MOD, rolling_hash
from tipoca_stream_spark.plans.registry import query
from tipoca_stream_spark.plans.training import _docs
from tipoca_stream_spark.sources.tables import load_table

SESSION_GAP_MIN = 30


@query(
    "asof_purchase_prior_view",
    """
    SELECT p.event_id,
           p.user_id,
           v.event_id AS view_event_id_asof,
           round(v.value, 6) AS view_value_asof
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    survey_ref="custom op: as-of join (backward inclusive)",
)
def asof_purchase_prior_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase enriched with the user's most recent prior view —
    checked against DuckDB's native ASOF JOIN."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_event_id"), F.col("value").alias("view_value")
    )
    out = asof_join(purchases, views, by=["user_id"], right_payload=["view_event_id", "view_value"])
    return out.select(
        "event_id",
        "user_id",
        F.col("view_event_id_asof"),
        F.round("view_value_asof", 6).alias("view_value_asof"),
    )


@query(
    "events_sessionize",
    f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events),
    flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) > {SESSION_GAP_MIN} * 60 * 1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM ordered),
    sessions AS (
      SELECT user_id, event_id, ts,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged)
    SELECT user_id, session_id, count(*) AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           (epoch_us(max(ts)) - epoch_us(min(ts))) AS duration_us
    FROM sessions GROUP BY user_id, session_id
    """,
    survey_ref="custom op: gap sessionization",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity closes a session): the
    batch shape of streaming session windows. One shuffle on user_id; the
    cumulative-sum window runs inside the same sort."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "is_new",
        F.when(
            gap_us.isNull() | (gap_us > SESSION_GAP_MIN * 60 * 1_000_000), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
    )


@query(
    "text_rolling_hash",
    f"""
    SELECT doc_id,
           CASE WHEN text IS NULL THEN NULL ELSE
             list_reduce(
               list_prepend(0::BIGINT, [ascii(c)::BIGINT for c in string_split(text, '')]),
               (acc, c) -> (acc * {ROLLING_BASE} + c) % {ROLLING_MOD}
             )
           END AS rolling_hash
    FROM documents
    """,
    survey_ref="training: rolling-hash fingerprint",
)
def text_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rolling_hash(_docs(spark, sf_dir), "text", "doc_id")


@query(
    "events_session_window_native",
    f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events),
    flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) >= {SESSION_GAP_MIN} * 60 * 1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM ordered),
    sessions AS (
      SELECT user_id, ts,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged)
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts) + INTERVAL {SESSION_GAP_MIN} MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
    survey_ref="custom op: native session windows",
)
def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window — the built-in form of the
    gaps-and-islands sessionizer above (and the batch shape of
    streaming/stateful.sessionize_stateful). Boundary semantics differ
    from events_sessionize by design and the oracle encodes them: the
    session interval is [start, last_event + gap), so an event arriving
    EXACTLY gap after the last starts a new session (>= in the oracle,
    > in the gaps-and-islands form), and session_end = last event + gap,
    not max(ts)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", f"{SESSION_GAP_MIN} minutes"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("session_window.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )


@query(
    "asof_nearest_view",
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    v AS (SELECT user_id, ts, event_id AS vid FROM events WHERE event_type = 'view'),
    t AS (
      SELECT user_id, ts, CAST(NULL AS BIGINT) AS vid, event_id, 0 AS is_v FROM p
      UNION ALL
      SELECT user_id, ts, vid, NULL, 1 FROM v),
    marked AS (
      SELECT user_id, ts, event_id, is_v,
             last_value(CASE WHEN is_v = 1 THEN vid END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, is_v DESC, vid NULLS LAST
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS back_vid,
             last_value(CASE WHEN is_v = 1 THEN epoch_us(ts) END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, is_v DESC, vid NULLS LAST
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS back_us,
             first_value(CASE WHEN is_v = 1 THEN vid END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, is_v DESC, vid NULLS LAST
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fwd_vid,
             first_value(CASE WHEN is_v = 1 THEN epoch_us(ts) END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, is_v DESC, vid NULLS LAST
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fwd_us
      FROM t)
    SELECT event_id, user_id,
           CASE WHEN back_us IS NULL THEN fwd_vid
                WHEN fwd_us IS NULL THEN back_vid
                WHEN epoch_us(ts) - back_us <= fwd_us - epoch_us(ts) THEN back_vid
                ELSE fwd_vid END AS nearest_vid,
           CASE WHEN back_us IS NULL THEN fwd_us - epoch_us(ts)
                WHEN fwd_us IS NULL THEN epoch_us(ts) - back_us
                WHEN epoch_us(ts) - back_us <= fwd_us - epoch_us(ts)
                     THEN epoch_us(ts) - back_us
                ELSE fwd_us - epoch_us(ts) END AS nearest_diff_us
    FROM marked WHERE is_v = 0
    """,
    survey_ref="custom op: nearest-in-time as-of join (bidirectional)",
)
def asof_nearest_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase aligned to its NEAREST view in time, either
    direction — the sensor-alignment flavor of as-of (backward-only
    as-of is asof_purchase_prior_view). Same union-tag + window
    composition: one shuffle on the group key, a running last (backward)
    plus a running first (forward), then an arithmetic pick; ties at
    zero distance resolve backward BY CONSTRUCTION (views sort before
    purchases at equal ts, so the backward window sees a diff-0
    candidate that always wins) — deterministic in both engines without
    a range join anywhere."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(None).cast("bigint").alias("vid"),
        "event_id", F.lit(0).alias("is_v"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("vid"),
        F.lit(None).cast("long").alias("event_id"), F.lit(1).alias("is_v"),
    )
    t = p.unionByName(v)
    # vid tiebreak: among views sharing a (user_id, ts) the window's
    # last/first must be deterministic (the repo-wide (ts, event_id)
    # rule); vid is NULL only on purchase rows, which is_v already
    # separates — NULLS LAST spelled out so both engines' null placement
    # agrees regardless
    order = [F.col("ts"), F.col("is_v").desc(), F.col("vid").asc_nulls_last()]
    w_back = (
        Window.partitionBy("user_id").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy("user_id").orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    view_vid = F.when(F.col("is_v") == 1, F.col("vid"))
    view_us = F.when(F.col("is_v") == 1, F.unix_micros("ts"))
    marked = t.select(
        "user_id", "ts", "event_id", "is_v",
        F.last(view_vid, ignorenulls=True).over(w_back).alias("back_vid"),
        F.last(view_us, ignorenulls=True).over(w_back).alias("back_us"),
        F.first(view_vid, ignorenulls=True).over(w_fwd).alias("fwd_vid"),
        F.first(view_us, ignorenulls=True).over(w_fwd).alias("fwd_us"),
    )
    us = F.unix_micros("ts")
    back_d = us - F.col("back_us")
    fwd_d = F.col("fwd_us") - us
    nearest_vid = (
        F.when(F.col("back_us").isNull(), F.col("fwd_vid"))
        .when(F.col("fwd_us").isNull(), F.col("back_vid"))
        .when(back_d <= fwd_d, F.col("back_vid"))
        .otherwise(F.col("fwd_vid"))
    )
    nearest_d = (
        F.when(F.col("back_us").isNull(), fwd_d)
        .when(F.col("fwd_us").isNull(), back_d)
        .when(back_d <= fwd_d, back_d)
        .otherwise(fwd_d)
    )
    return marked.where(F.col("is_v") == 0).select(
        "event_id", "user_id",
        nearest_vid.alias("nearest_vid"),
        nearest_d.alias("nearest_diff_us"),
    )


@query(
    "window_rolling_median",
    """
    SELECT user_id, event_id,
           round(median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 10 PRECEDING AND CURRENT ROW), 6) AS med11
    FROM events
    """,
    survey_ref="§2.7 rolling exact median (order-statistic window)",
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling median over the last 11 events per user — the
    robust-smoothing window mean can't provide. Served by
    ``operators/rolling.rolling_median``'s EXPRESSION path: the bounded
    11-row frame is collected, sorted JVM-side inside codegen, and
    interpolated with the same (n odd -> middle, n even -> mean of
    middles) null-skipping rule DuckDB's windowed median applies.
    O(w log w) per row is the right trade at w=11; the wide-frame twin
    below exercises the O(log w) order-statistic path."""
    from tipoca_stream_spark.operators.rolling import rolling_median

    ev = load_table(spark, sf_dir, "events")
    out = rolling_median(
        ev, "user_id", ["ts", "event_id"], "value", w=11, method="expression"
    )
    return out.select("user_id", "event_id", F.round(F.col("med"), 6).alias("med11"))


@query(
    "window_rolling_median_wide",
    """
    SELECT user_id, event_id,
           round(median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 100 PRECEDING AND CURRENT ROW), 6) AS med101
    FROM events
    """,
    survey_ref="§2.7 rolling exact median, wide frame (skiplist order-statistic path)",
)
def window_rolling_median_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME contract at w=101, served by the ORDER-STATISTIC path
    (round 7, VERDICT r6 worklist #6): pandas' skiplist rolling median —
    O(log w) per step, so frame width stops being a cost multiplier.
    Round 14: the default serving shape is the partition-STREAMING
    ``mapInPandas`` fold (operators/rolling._stream_path) — one hash
    exchange + sort, all users of an Arrow batch in one vectorized
    ``groupby().rolling`` call — which replaced the per-user
    ``applyInPandas`` dispatch (measured 5.3 → 0.56 s at sf0.1: ~1500
    tiny groups paid ~3 ms each of Arrow/pandas/dispatch overhead). The
    expression path's per-row sort stays the measured cliff at this
    width; pinned against the identical DuckDB windowed-median oracle."""
    from tipoca_stream_spark.operators.rolling import rolling_median

    # round 14: project to the 4 columns the fold needs BEFORE the Python
    # boundary — applyInPandas ships every input column through Arrow and
    # Spark cannot see which ones the function touches (guide §4.1)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    out = rolling_median(
        ev, "user_id", ["ts", "event_id"], "value", w=101, method="order_statistic"
    )
    return out.select("user_id", "event_id", F.round(F.col("med"), 6).alias("med101"))
