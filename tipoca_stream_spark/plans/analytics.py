"""Event-analytics family: funnel conversion, retention cohorts, and
activity streaks (gaps-and-islands).

The reference's output is a warehouse table of CDC'd events; these are the
canonical queries an analyst then runs on it. Each is expressed as the
plan you'd want at 100 TB: every aggregate/window keys on ``user_id``, so
the whole family costs ONE fact shuffle whose partitioning is reused
across stages (Catalyst reuses the exchange for same-key operations), and
all stage outputs are user-cardinality or smaller.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tipoca_stream_spark.plans.registry import query
from tipoca_stream_spark.sources.tables import load_table

from tipoca_stream_spark.operators.checkpoint import SPILL_LEVEL

FUNNEL_STAGES = ("view", "click", "purchase")


@query(
    "events_funnel_counts",
    """
    WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 ON s1.user_id = e.user_id
           WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 ON s2.user_id = e.user_id
           WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
    SELECT count(s1.user_id) AS n_view,
           count(s2.user_id) AS n_view_click,
           count(s3.user_id) AS n_view_click_purchase
    FROM s1 LEFT JOIN s2 ON s2.user_id = s1.user_id
            LEFT JOIN s3 ON s3.user_id = s1.user_id
    """,
    survey_ref="analytics: ordered funnel conversion",
)
def events_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view→click→purchase: a user converts a stage only
    with an event strictly after their previous stage's first event.
    Three user-keyed aggregates, each over an already-filtered slice and
    joined on user_id — one shuffle key throughout, so at scale this is a
    single fact repartition plus user-cardinality joins."""
    events = load_table(spark, sf_dir, "events")
    s1 = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        events.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        events.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .agg(
            F.count("t1").alias("n_view"),
            F.count("t2").alias("n_view_click"),
            F.count("t3").alias("n_view_click_purchase"),
        )
    )


@query(
    "events_retention_cohorts",
    """
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week FROM events)
    SELECT strftime(f.cohort_week, '%Y-%m-%d') AS cohort_week,
           (datediff('day', f.cohort_week, a.active_week) / 7)::int AS week_offset,
           count(*) AS n_users
    FROM firsts f JOIN activity a ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
    survey_ref="analytics: retention cohorts",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: users bucketed by first-seen week,
    counted in each later week they were active. Two user-keyed
    aggregates + a user-keyed join (the distinct rides the same shuffle);
    output is |cohorts|×|weeks| — tiny at any scale."""
    events = load_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = events.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    return (
        firsts.join(activity, "user_id")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.col("active_week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_users"))
    )


@query(
    "events_activity_streaks",
    """
    WITH days AS (SELECT DISTINCT user_id, date_trunc('day', ts)::date AS d FROM events),
    flagged AS (
      SELECT user_id, d,
             CASE WHEN datediff('day', lag(d) OVER (PARTITION BY user_id ORDER BY d), d) = 1
                  THEN 0 ELSE 1 END AS new_streak
      FROM days),
    islands AS (
      SELECT user_id, d,
             sum(new_streak) OVER (PARTITION BY user_id ORDER BY d
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS streak_id
      FROM flagged),
    lens AS (SELECT user_id, streak_id, count(*) AS len FROM islands GROUP BY user_id, streak_id),
    longest AS (SELECT user_id, max(len) AS longest_streak FROM lens GROUP BY user_id)
    SELECT longest_streak, count(*) AS n_users
    FROM longest GROUP BY longest_streak
    """,
    survey_ref="analytics: gaps-and-islands streaks",
)
def events_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user, as a
    distribution — the gaps-and-islands pattern: lag → new-streak flag →
    running sum (island id) → island length → per-user max. Every window
    partitions by user_id over the deduped (user, day) table, so the
    heavy lifting is one shuffle of at most users×days rows."""
    events = load_table(spark, sf_dir, "events")
    days = events.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    flagged = days.withColumn(
        "new_streak",
        F.when(F.datediff(F.col("d"), F.lag("d").over(w)) == 1, 0).otherwise(1),
    )
    islands = flagged.withColumn(
        "streak_id",
        F.sum("new_streak").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    lens = islands.groupBy("user_id", "streak_id").agg(F.count("*").alias("len"))
    longest = lens.groupBy("user_id").agg(F.max("len").alias("longest_streak"))
    return longest.groupBy("longest_streak").agg(F.count("*").alias("n_users"))


@query(
    "cdc_scd2_history",
    """
    WITH ordered AS (
      SELECT user_id, ts, value,
             CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
      FROM events)
    SELECT user_id, value,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
           strftime(next_ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_to
    FROM ordered WHERE op <> 'd'
    """,
    survey_ref="CDC: SCD2 history materialization",
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 history of the events changelog (user_id as the PK,
    event_type 'error' standing in for the Debezium delete op, event_id as
    the offset tiebreak). One window pass — same shuffle envelope as the
    latest-wins merge; intervals emitted as formatted strings (registry
    rule for timestamps)."""
    from tipoca_stream_spark.operators.scd2 import scd2_history

    events = load_table(spark, sf_dir, "events").withColumn(
        "op", F.when(F.col("event_type") == "error", "d").otherwise("u")
    )
    hist = scd2_history(
        events, key_col="user_id", ts_col="ts", op_col="op",
        value_cols=["value"], seq_col="event_id",
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return hist.select(
        "user_id",
        "value",
        F.date_format("valid_from", fmt).alias("valid_from"),
        F.date_format("valid_to", fmt).alias("valid_to"),
    )


@query(
    "dq_orders_gate",
    """
    SELECT 'o_orderkey_not_null' AS rule, sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)::bigint AS n_violations FROM orders
    UNION ALL
    SELECT 'o_totalprice_in_range', sum(CASE WHEN o_totalprice IS NOT NULL AND (o_totalprice < 0.0 OR o_totalprice >= 10000000.0) THEN 1 ELSE 0 END)::bigint FROM orders
    UNION ALL
    SELECT 'o_orderdate_in_range', sum(CASE WHEN o_orderdate IS NOT NULL AND (o_orderdate < TIMESTAMP '1990-01-01' OR o_orderdate >= TIMESTAMP '2030-01-01') THEN 1 ELSE 0 END)::bigint FROM orders
    UNION ALL
    SELECT 'o_orderstatus_in_set', sum(CASE WHEN o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END)::bigint FROM orders
    UNION ALL
    SELECT 'pk_unique', coalesce(sum(c - 1), 0)::bigint FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)
    """,
    survey_ref="DQ: constraint gate before publish",
)
def dq_orders_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint gate over orders: NOT NULL / range / set-membership
    rules fused into ONE scan (each rule is a conditional sum in the same
    aggregate projection) plus a PK-uniqueness aggregate. The (rule, n)
    output is what the supervisor consumes to block a release."""
    from tipoca_stream_spark.operators import quality_gate as dq

    orders = load_table(spark, sf_dir, "orders")
    rules = [
        dq.not_null("o_orderkey"),
        dq.in_range("o_totalprice", 0.0, 10_000_000.0),
        dq.in_range(
            "o_orderdate",
            F.lit("1990-01-01").cast("timestamp"),
            F.lit("2030-01-01").cast("timestamp"),
        ),
        dq.in_set("o_orderstatus", ["F", "O", "P"]),
    ]
    return dq.violation_counts(orders, rules, unique_keys=["o_orderkey"])


@query(
    "feature_quantile_bins",
    """
    WITH cuts AS (
      SELECT quantile_cont(value, 0.25) AS c1,
             quantile_cont(value, 0.50) AS c2,
             quantile_cont(value, 0.75) AS c3
      FROM events)
    SELECT bin, count(*) AS n,
           round(min(value), 6) AS lo,
           round(max(value), 6) AS hi
    FROM (
      SELECT CASE WHEN value < c1 THEN 0
                  WHEN value < c2 THEN 1
                  WHEN value < c3 THEN 2
                  ELSE 3 END AS bin,
             value
      FROM events, cuts)
    GROUP BY bin
    """,
    survey_ref="training: equal-frequency feature binning",
)
def feature_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency (quartile) binning of a numeric feature WITHOUT a
    global sort: exact percentile cut points come from one aggregate
    (percentile_cont), broadcast as a 1-row join, and binning is a codegen
    CASE — the scale-safe form of ntile() for feature engineering (a
    global ntile window would funnel the fact through one task)."""
    events = load_table(spark, sf_dir, "events")
    cuts = events.agg(
        F.percentile("value", F.lit(0.25)).alias("c1"),
        F.percentile("value", F.lit(0.50)).alias("c2"),
        F.percentile("value", F.lit(0.75)).alias("c3"),
    )
    binned = events.join(F.broadcast(cuts)).select(
        F.when(F.col("value") < F.col("c1"), 0)
        .when(F.col("value") < F.col("c2"), 1)
        .when(F.col("value") < F.col("c3"), 2)
        .otherwise(3)
        .alias("bin"),
        "value",
    )
    return binned.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
    )


@query(
    "events_moving_avg_1h",
    """
    SELECT event_id, user_id,
           CAST(sum(CAST(value AS DECIMAL(18,6)))
                  OVER w AS DOUBLE)
             / count(*) OVER w AS avg_1h
    FROM events
    WHERE user_id < 10
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
    survey_ref="§2.7 time-based RANGE frame (sliding window feature)",
)
def events_moving_avg_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 1-hour trailing average — the time-based RANGE frame.
    Spark's rangeBetween is numeric, so the frame orders by epoch seconds
    with a 3600-second lookback (identical row set to DuckDB's INTERVAL
    frame: ts has microsecond precision and the boundary is inclusive in
    both). The sum rides DECIMAL so the frame aggregation is
    order-insensitive and cross-engine exact; one user-keyed shuffle."""
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        (
            F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
            / F.count("*").over(w)
        ).alias("avg_1h"),
    )


@query(
    "events_gapfill_locf",
    """
    WITH agg AS (
      SELECT event_type, date_trunc('minute', ts) AS bucket,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS val
      FROM events
      WHERE ts < TIMESTAMP '2024-01-08 00:00:00'
      GROUP BY 1, 2),
    bounds AS (
      SELECT event_type, min(bucket) AS b0, max(bucket) AS b1
      FROM agg GROUP BY 1),
    grid AS (
      SELECT event_type, unnest(generate_series(b0, b1, INTERVAL 1 MINUTE)) AS bucket
      FROM bounds),
    j AS (
      SELECT g.event_type, g.bucket, a.n, a.val
      FROM grid g LEFT JOIN agg a USING (event_type, bucket))
    SELECT event_type, bucket,
           coalesce(n, 0)::BIGINT AS n_events,
           last_value(val IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS val_locf,
           (n IS NULL) AS gap
    FROM j
    """,
    survey_ref="training: hypertable gap-fill + last-observation-carried-forward",
)
def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timescale-style time-bucket gap-fill with LOCF interpolation: build
    the dense per-type minute grid between each type's observed bounds,
    left-join the real bucket aggregates, and carry the last observed
    bucket value forward across the gaps.

    100 TB shape: the bucket aggregate is the only data-sized shuffle; the
    grid is bounded by (types x buckets), never by event count, and is
    generated from a per-type 1-row bounds table via sequence+explode. The
    LOCF window partitions by type over grid-sized (not event-sized) rows.
    Bucket sums ride DECIMAL so both engines agree bit-for-bit."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-08 00:00:00").cast("timestamp")
    )
    agg = events.groupBy(
        "event_type", F.date_trunc("minute", F.col("ts")).alias("bucket")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("val"),
    )
    bounds = agg.groupBy("event_type").agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    )
    grid = bounds.select(
        "event_type",
        F.explode(F.expr("sequence(b0, b1, interval 1 minute)")).alias("bucket"),
    )
    j = grid.join(agg, ["event_type", "bucket"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "event_type",
        "bucket",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        F.last("val", ignorenulls=True).over(w).alias("val_locf"),
        F.col("n").isNull().alias("gap"),
    )


@query(
    "dq_orders_fk_gate",
    """
    SELECT 'o_custkey_fk' AS rule, count(*)::bigint AS n_violations
    FROM orders o
    WHERE o.o_custkey IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'l_orderkey_fk', count(*)::bigint
    FROM lineitem l
    WHERE l.l_orderkey IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    """,
    survey_ref="DQ: referential integrity",
)
def dq_orders_fk_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity gate: orders→customer and lineitem→orders.
    Each check is one anti join against the dimension's distinct keys;
    the fact is scanned once per relationship (unavoidable — different
    join keys), output is two counter rows."""
    from tipoca_stream_spark.operators.quality_gate import fk_violations

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    a = fk_violations(
        orders.select("o_custkey"),
        "o_custkey",
        customer.select(F.col("c_custkey").alias("o_custkey")),
        "o_custkey",
    )
    b = fk_violations(
        lineitem.select("l_orderkey"),
        "l_orderkey",
        orders.select(F.col("o_orderkey").alias("l_orderkey")),
        "l_orderkey",
    )
    return a.unionByName(b)


@query(
    "events_click_to_purchase",
    """
    WITH seq AS (
      SELECT user_id, ts, event_type,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events WHERE event_type IN ('click', 'purchase'))
    SELECT user_id,
           count(*) AS n_conversions,
           CAST(min(datediff('microsecond', ts, next_ts)) AS BIGINT) AS min_latency_us,
           CAST(max(datediff('microsecond', ts, next_ts)) AS BIGINT) AS max_latency_us
    FROM seq
    WHERE event_type = 'click' AND next_type = 'purchase'
    GROUP BY user_id
    """,
    survey_ref="analytics: event-sequence pattern (A immediately followed by B)",
)
def events_click_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern matching (MATCH_RECOGNIZE-lite): click events
    whose NEXT click-or-purchase event for the user is a purchase, with
    latency bounds. One lead() window over the pre-filtered event pair —
    a single user-keyed shuffle; latencies are exact integer micros."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id",
        "ts",
        "event_type",
        F.lead("ts").over(w).alias("next_ts"),
        F.lead("event_type").over(w).alias("next_type"),
    )
    lat_us = F.unix_micros(F.col("next_ts")) - F.unix_micros(F.col("ts"))
    return (
        seq.filter((F.col("event_type") == "click") & (F.col("next_type") == "purchase"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_conversions"),
            F.min(lat_us).alias("min_latency_us"),
            F.max(lat_us).alias("max_latency_us"),
        )
    )


def cooccurrence_pairs(
    df: DataFrame,
    key_col: str,
    item_col: str,
    out_a: str = "item_a",
    out_b: str = "item_b",
    n_col: str = "n_keys",
    min_count: int = 2,
    max_group_size: int | None = None,
    observation=None,
    distinct_only: bool = False,
) -> DataFrame:
    """Item pairs sharing a key, counted across keys — the market-basket
    pattern as a bounded-group expansion: group to (key → sorted distinct
    item list), emit C(n,2) pairs per key with nested array transforms,
    then one pair-keyed count. ONE item shuffle (the self-join form
    shuffles twice and re-scans the input for the second branch).

    ``max_group_size`` caps hot keys exactly like the LSH hot-bucket guard
    (operators/corpus_dedup.py lsh_candidate_pairs): on generic data one
    degenerate key (a "basket" with 1M items) would emit C(n,2) pairs from
    a single task. Oversized groups are dropped and the drop is observed
    (``dropped_groups`` / ``dropped_items``) so the cap is never silent;
    pass a ``pyspark.sql.Observation`` to read it after an action.

    ``distinct_only=True`` (round 14) returns the DISTINCT canonical pairs
    (``out_a < out_b``, no count column): consumers that only need the edge
    set (triangle counting) skip the pair-keyed count shuffle entirely —
    at 1.2M pairs per sf0.1 that is a full corpus-sized exchange. Requires
    ``min_count <= 1`` (a count threshold needs the count)."""
    if distinct_only and min_count > 1:
        raise ValueError("distinct_only requires min_count <= 1")
    groups = (
        df.select(key_col, item_col)
        .groupBy(key_col)
        .agg(F.sort_array(F.collect_set(F.col(item_col))).alias("items"))
        .filter(F.size("items") > 1)
    )
    if max_group_size is not None:
        over = F.size("items") > max_group_size
        groups = groups.observe(
            observation if observation is not None else "cooccurrence_hot_group_drops",
            F.count(F.when(over, 1)).alias("dropped_groups"),
            F.coalesce(F.sum(F.when(over, F.size("items"))), F.lit(0)).alias(
                "dropped_items"
            ),
        ).filter(~over)
    # round 14: C(n,2) expansion via two Generate operators instead of the
    # nested transform+flatten — the HOF form is CodegenFallback
    # (interpreted) and its per-element slice built 1.2M structs through
    # the expression interpreter (measured 36% slower at sf0.1); explode is
    # codegen-able. Same pairs, same order guarantees (items sorted, slice
    # starts at i+2, so out_a < out_b).
    exploded = groups.select(
        F.posexplode("items").alias("_i", out_a), F.col("items")
    ).select(
        F.col(out_a),
        F.explode(F.slice(F.col("items"), F.col("_i") + 2, F.size("items"))).alias(
            out_b
        ),
    )
    if distinct_only:
        # pairs are emitted once per shared key; collapse to the edge set.
        # Keys were collect_set + sort_array'd, so out_a < out_b already.
        return exploded.distinct()
    return (
        exploded.groupBy(out_a, out_b)
        .agg(F.count("*").alias(n_col))
        .filter(F.col(n_col) >= min_count)
    )


@query(
    "analytics_part_cooccurrence",
    """
    WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_orders
    FROM lp a JOIN lp b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING count(*) >= 2
    """,
    survey_ref="analytics: market-basket co-occurrence (capped group expansion)",
)
def analytics_part_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part pairs bought together in >= 2 orders, via ``cooccurrence_pairs``:
    one orderkey shuffle, pair expansion quadratic only WITHIN an order
    (TPC-H orders hold <= 7 lines), and a 256-item hot-group cap with
    observed drops so a pathological mega-order on generic data stays
    bounded — same guard as lsh_candidate_pairs. The cap is far above any
    TPC-H group size, so oracle results are unaffected."""
    return cooccurrence_pairs(
        load_table(spark, sf_dir, "lineitem"),
        key_col="l_orderkey",
        item_col="l_partkey",
        out_a="part_a",
        out_b="part_b",
        n_col="n_orders",
        min_count=2,
        max_group_size=256,
    )


@query(
    "analytics_revenue_share",
    """
    WITH rev AS (
      SELECT n.n_name AS nation, r.r_name AS region,
             CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS revenue
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2)
    SELECT nation, region,
           CAST(revenue AS DOUBLE) AS revenue,
           round(CAST(revenue AS DOUBLE) / CAST(sum(revenue) OVER (PARTITION BY region) AS DOUBLE), 6)
             AS share_of_region,
           round(CAST(revenue AS DOUBLE) / CAST(sum(revenue) OVER () AS DOUBLE), 6)
             AS share_of_total
    FROM rev
    """,
    survey_ref="analytics: ratio-to-report (two-level share-of-total windows)",
)
def analytics_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each nation's revenue as a share of its region and of the world —
    the ratio-to-report pattern. The star join broadcasts every dim; the
    two share windows run over the ~nations-sized aggregate, so the only
    O(data) stage is the fact scan. Revenue goes through DECIMAL so both
    engines sum exactly; shares divide as double only at the end."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
            ).cast("decimal(18,4)").alias("revenue")
        )
    )
    wr = Window.partitionBy("region")
    wt = Window.partitionBy()
    rev_d = F.col("revenue").cast("double")
    return rev.select(
        "nation",
        "region",
        rev_d.alias("revenue"),
        F.round(rev_d / F.sum("revenue").over(wr).cast("double"), 6).alias("share_of_region"),
        F.round(rev_d / F.sum("revenue").over(wt).cast("double"), 6).alias("share_of_total"),
    )


@query(
    "join_scd2_pointintime",
    """
    WITH dim AS (
      SELECT user_id, ts, value,
             CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
      FROM events WHERE event_type <> 'purchase'),
    hist AS (SELECT user_id, value, ts AS valid_from, next_ts AS valid_to
             FROM dim WHERE op <> 'd'),
    facts AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT f.event_id, f.user_id, h.value AS state_value
    FROM facts f JOIN hist h ON h.user_id = f.user_id
     AND f.ts >= h.valid_from AND (h.valid_to IS NULL OR f.ts < h.valid_to)
    """,
    survey_ref="CDC: point-in-time (temporal) join against SCD2 history",
)
def join_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The consumption half of SCD2 (cdc_scd2_history is the production
    half): each purchase fact joins the dimension version VALID AT ITS
    TIMESTAMP — user state from the non-purchase changelog ('error'
    closes intervals as the delete op), validity = [valid_from,
    valid_to). Intervals per key are disjoint by construction, so every
    fact lands in at most one version. Plan: equi-join keyed on user_id
    with the interval containment as residual — one keyed shuffle each
    side, never a range cross-product; the as-of variant
    (asof_purchase_prior_view) is the nearest-event cousin, this is the
    versioned-dimension lookup every warehouse star schema does."""
    from tipoca_stream_spark.operators.scd2 import scd2_history

    ev = load_table(spark, sf_dir, "events")
    dim_changes = ev.filter(F.col("event_type") != "purchase").withColumn(
        "op", F.when(F.col("event_type") == "error", "d").otherwise("u")
    )
    hist = scd2_history(
        dim_changes, key_col="user_id", ts_col="ts", op_col="op",
        value_cols=["value"], seq_col="event_id",
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    cond = (F.col("ts") >= F.col("valid_from")) & (
        F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))
    )
    return (
        facts.join(hist, "user_id")
        .where(cond)
        .select("event_id", "user_id", F.col("value").alias("state_value"))
    )


@query(
    "events_new_vs_returning",
    """
    WITH activity AS (
      SELECT DISTINCT user_id, date_trunc('day', ts)::date AS d FROM events),
    first_seen AS (SELECT user_id, min(d) AS first_d FROM activity GROUP BY user_id)
    SELECT a.d AS day,
           sum(CASE WHEN a.d = f.first_d THEN 1 ELSE 0 END)::bigint AS n_new,
           sum(CASE WHEN a.d > f.first_d THEN 1 ELSE 0 END)::bigint AS n_returning
    FROM activity a JOIN first_seen f USING (user_id)
    GROUP BY a.d
    """,
    survey_ref="analytics: daily new vs returning actives (cumulative-distinct)",
)
def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day split of active users into first-ever-seen vs returning —
    the cumulative-distinct problem: COUNT(DISTINCT) OVER a running
    window doesn't exist in either engine, and the standard rewrite is
    exactly this (dedupe to (user, day), min-day per user, classify each
    active day against it). Two aggregates keyed on user_id + one keyed
    join; at 100 TB the shuffles carry at most users x active-days rows,
    never raw events. 'day' ships as a DATE (not the registry's
    string-formatted timestamps: DATE compares exactly cross-engine)."""
    events = load_table(spark, sf_dir, "events")
    activity = events.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("d")
    ).distinct()
    first_seen = activity.groupBy("user_id").agg(F.min("d").alias("first_d"))
    return (
        activity.join(first_seen, "user_id")
        .groupBy(F.col("d").alias("day"))
        .agg(
            F.sum(F.when(F.col("d") == F.col("first_d"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_new"),
            F.sum(F.when(F.col("d") > F.col("first_d"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_returning"),
        )
    )


@query(
    "events_markov_transitions",
    """
    WITH ordered AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events)
    SELECT prev_type, event_type AS next_type, count(*) AS n,
           round(count(*)::double / sum(count(*)) OVER (PARTITION BY prev_type), 6) AS p
    FROM ordered WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
    survey_ref="analytics: behavior transition matrix (first-order Markov)",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for every
    (previous event type -> next event type) pair, the count and the
    row-normalized probability. One lag window per user + one k^2-key
    aggregate + a k-key normalizing window — funnels tell you whether a
    fixed path happens, this tells you where every path goes. The heavy
    shuffle is the user-keyed lag; everything after is tiny (k=5
    types)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    counts = ordered.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").alias("n")
    )
    w_norm = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type", "next_type", "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(w_norm), 6).alias("p"),
    )


# --- cross-source n-gram overlap audit ---------------------------------------

_SOURCE_OVERLAP_ORACLE = """
    WITH w AS (
      SELECT source, string_split(text, ' ') AS ws
      FROM documents WHERE source IS NOT NULL AND text IS NOT NULL
    ),
    sh AS (
      SELECT DISTINCT source,
             ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS shingle
      FROM (SELECT source, ws, unnest(range(1, len(ws) - 1)) AS i
            FROM w WHERE len(ws) >= 3)
    ),
    sizes AS (SELECT source, count(*)::BIGINT AS n FROM sh GROUP BY source),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b, count(*)::BIGINT AS n_shared
      FROM sh a JOIN sh b USING (shingle)
      WHERE a.source < b.source
      GROUP BY 1, 2
    )
    SELECT src_a, src_b, n_shared,
           round(n_shared / (sa.n + sb.n - n_shared), 6) AS jaccard,
           round(n_shared / least(sa.n, sb.n), 6) AS containment
    FROM pairs
    JOIN sizes sa ON sa.source = src_a
    JOIN sizes sb ON sb.source = src_b
    """


@query(
    "analytics_source_overlap",
    _SOURCE_OVERLAP_ORACLE,
    survey_ref="training: cross-source contamination audit (n-gram overlap matrix)",
)
def analytics_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise content overlap between corpus SOURCES — the audit run
    before mixing: how much of source B is already inside source A
    (crawl snapshots overlap, mirrors duplicate each other, a 'curated'
    set is often a subset of the crawl). Per ordered source pair:
    distinct shared 3-word shingles, Jaccard, and containment (share of
    the smaller side — the early-warning number: high containment at low
    Jaccard means one source swallows the other).

    Scale shape: the corpus-sized stage is one distinct over (source,
    shingle); the pair join is keyed on shingle and PRUNED first to
    shingles present in ≥2 sources (the df≥2 trick from corpus_dedup —
    the singleton long tail, most of a real corpus, never reaches the
    join), and a shingle shared by all S sources fans out to at most
    S(S-1)/2 pair rows — sources are dozens, not corpus-sized. The prune
    is answer-preserving, so the oracle skips it."""
    from tipoca_stream_spark.operators.corpus_dedup import word_shingles

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull() & F.col("text").isNotNull()
    )
    # materialize the distinct (source, shingle) set ONCE — it feeds four
    # downstream consumers (sizes, the df≥2 prune, and both join sides);
    # without the checkpoint Spark re-executes the corpus explode+distinct
    # per consumer
    sh = (
        word_shingles(docs, "text", "doc_id", n=3, carry=["source"])
        .select("source", "shingle")
        .distinct()
        .localCheckpoint(eager=True, storageLevel=SPILL_LEVEL)
    )
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n"))
    shared = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= 2)
        .select("shingle")
    )
    pruned = sh.join(shared, "shingle", "left_semi")
    a, b = pruned.alias("a"), pruned.alias("b")
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    sa = F.broadcast(sizes.select(F.col("source").alias("src_a"), F.col("n").alias("na")))
    sb = F.broadcast(sizes.select(F.col("source").alias("src_b"), F.col("n").alias("nb")))
    return (
        pairs.join(sa, "src_a")
        .join(sb, "src_b")
        .select(
            "src_a",
            "src_b",
            "n_shared",
            F.round(
                F.col("n_shared") / (F.col("na") + F.col("nb") - F.col("n_shared")), 6
            ).alias("jaccard"),
            F.round(
                F.col("n_shared") / F.least(F.col("na"), F.col("nb")), 6
            ).alias("containment"),
        )
    )


# --- full referential-integrity matrix ----------------------------------------

_FK_EDGES = [
    # (rule, fact, fk, dim, pk)
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
]

_FK_MATRIX_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{rule}' AS edge,
           (SELECT count(*) FROM {fact} WHERE {fk} IS NOT NULL)::BIGINT AS n_rows,
           (SELECT count(*) FROM {fact} f WHERE f.{fk} IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM {dim} d WHERE d.{pk} = f.{fk}))::BIGINT
             AS n_orphans"""
    for rule, fact, fk, dim, pk in _FK_EDGES
)


@query(
    "dq_fk_matrix",
    _FK_MATRIX_ORACLE,
    survey_ref="DQ: full referential-integrity matrix (every FK edge)",
)
def dq_fk_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete referential-integrity audit — one row per FK edge of
    the schema (7 edges) with the referencing-row count and the orphan
    count: the table a warehouse DQ dashboard renders after every load
    (dq_orders_fk_gate checks the two hot edges; this is the full
    matrix). Each edge is one left-anti join against the dimension's
    distinct keys — dims broadcast, the two fact scans are per-edge
    column-pruned projections."""
    from tipoca_stream_spark.operators.quality_gate import fk_violations

    out = None
    for rule, fact, fk, dim, pk in _FK_EDGES:
        f = load_table(spark, sf_dir, fact).select(fk)
        d = load_table(spark, sf_dir, dim).select(F.col(pk).alias(fk))
        n_rows = f.filter(F.col(fk).isNotNull()).agg(
            F.count(F.lit(1)).cast("long").alias("n_rows")
        )
        viol = fk_violations(f, fk, d, fk).select(
            F.col("n_violations").alias("n_orphans")
        )
        row = (
            n_rows.crossJoin(viol)
            .select(
                F.lit(rule).alias("edge"),
                "n_rows",
                "n_orphans",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out
