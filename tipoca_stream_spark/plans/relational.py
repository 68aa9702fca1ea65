"""Relational query inventory: the CDC data plane (SURVEY.md §2.1-2.3) plus
the standard query surface (§2.5-2.10) the engine must expose.

The ``events`` table doubles as the CDC stream carrier (FIXTURES.md driver
note): ``event_id`` is the Kafka offset, ``user_id`` the primary key, and
``event_type`` maps deterministically onto the Debezium operation
(signup→CREATE, error→DELETE, else UPDATE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tipoca_stream_spark.functions.masking import MaskConfig, TableMaskRules, apply_mask
from tipoca_stream_spark.operators.cdc import COL_DEBEZIUM_OP, COL_KAFKA_OFFSET
from tipoca_stream_spark.operators.dedupe import latest_wins
from tipoca_stream_spark.operators.merge import merge_into_target
from tipoca_stream_spark.plans.registry import query
from tipoca_stream_spark.sources.tables import load_table


def _events_as_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("user_id"),
        F.col("event_type"),
        F.col("value"),
        F.col("event_id").alias(COL_KAFKA_OFFSET),
        F.when(F.col("event_type") == "error", "DELETE")
        .when(F.col("event_type") == "signup", "CREATE")
        .otherwise("UPDATE")
        .alias(COL_DEBEZIUM_OP),
    )


# --- CDC merge plane (M1-M6, ref load_processor.go:386-444) -----------------

CDC_MERGE_ORACLE = """
WITH ranked AS (
  SELECT user_id, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events)
SELECT user_id, event_type, value
FROM ranked WHERE rn = 1 AND event_type <> 'error'
"""


@query("cdc_merge_lww", CDC_MERGE_ORACLE, survey_ref="M1-M6,J1,J2,W1")
def cdc_merge_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full last-write-wins CDC merge of the events stream into an
    empty target — dedupe (M2), delete-common (M3), delete-op filter (M4),
    insert (M5).

    Round 14: the empty bootstrap target is declared with ``limit(0)`` so
    the optimizer SEES it is empty (a bare ``createDataFrame([], schema)``
    is an opaque RDD scan): OptimizeLimitZero → PropagateEmptyRelation
    prunes the M3 anti-join + M5 union branch at plan time, and with one
    consumer left the M2 materialization point is skipped
    (``persist_dedupe=False``) — plan went from 5 jobs (cache fill +
    broadcast + union) to the bare dedupe aggregate; identical rows. Real
    targets (steady-state merges, the streaming plane) keep the full
    M1-M6 plan and the persist."""
    batch = _events_as_cdc(spark, sf_dir)
    target = spark.createDataFrame(
        [], "user_id long, event_type string, value double"
    ).limit(0)
    return merge_into_target(target, batch, ["user_id"], persist_dedupe=False)


@query(
    "m2_dedupe_latest",
    """
    WITH ranked AS (
      SELECT user_id, event_id, event_type, value,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM events)
    SELECT user_id, event_id, event_type, value FROM ranked WHERE rn = 1
    """,
    survey_ref="M2,W1",
)
def m2_dedupe_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins dedupe alone (redshift.go:666-698) via map-side-combine
    max_by — shuffles one row per key, not one per event."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "value")
    return latest_wins(ev, ["user_id"], order_col="event_id")


@query(
    "m3_delete_common_anti",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    survey_ref="M3,J2",
)
def m3_delete_common_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeleteCommon's complement set as a left-anti join
    (redshift.go:701-753): rows NOT touched by the incoming key set."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders.select(F.col("o_custkey").alias("c_custkey")), ["c_custkey"], "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "m4_delete_op_filter",
    """
    SELECT event_type, count(*) AS n
    FROM events WHERE event_type <> 'error'
    GROUP BY event_type
    """,
    survey_ref="M4",
)
def m4_delete_op_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-op filter (redshift.go:779-795) + count per surviving op."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") != "error").groupBy("event_type").agg(F.count("*").alias("n"))


@query(
    "a1_batch_event_counts",
    """
    SELECT
      count(*) FILTER (WHERE event_type = 'signup') AS create_events,
      count(*) FILTER (WHERE event_type IS NULL
                          OR event_type NOT IN ('signup','error')) AS update_events,
      count(*) FILTER (WHERE event_type = 'error') AS delete_events
    FROM events
    """,
    survey_ref="A1,M6",
)
def a1_batch_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch counters driving the append fast-path decision
    (batch_processor.go:429-440, load_processor.go:774-781)."""
    batch = _events_as_cdc(spark, sf_dir)
    return batch.agg(
        F.count(F.when(F.col(COL_DEBEZIUM_OP) == "CREATE", 1)).alias("create_events"),
        F.count(F.when(F.col(COL_DEBEZIUM_OP) == "UPDATE", 1)).alias("update_events"),
        F.count(F.when(F.col(COL_DEBEZIUM_OP) == "DELETE", 1)).alias("delete_events"),
    )


@query(
    "s10_tombstone_skip",
    """
    SELECT count(*) AS n_live
    FROM events WHERE props IS NOT NULL AND length(props) > 0
    """,
    survey_ref="S10",
)
def s10_tombstone_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstone (empty-payload) skip (batcher_handler.go:230-237)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("props").isNotNull() & (F.length("props") > 0))
        .agg(F.count("*").alias("n_live"))
    )


# --- Masking plane (P5-P18), sha256 so DuckDB can oracle it -----------------

MASK_SALT = "oracle-salt"

MASK_ORACLE = f"""
SELECT
  c_custkey,
  CASE WHEN c_mktsegment IN ('AUTOMOBILE','MACHINERY') THEN c_name
       ELSE sha256(c_name || '{MASK_SALT}') END AS c_name,
  sha256(c_nationkey::varchar || '{MASK_SALT}') AS c_nationkey,
  sha256(c_acctbal::varchar || '{MASK_SALT}') AS c_acctbal,
  CASE WHEN c_mktsegment = 'BUILDING' THEN c_mktsegment
       ELSE sha256(c_mktsegment || '{MASK_SALT}') END AS c_mktsegment,
  coalesce(length(c_name), 0)::int AS c_name_length,
  substr(c_name, 1, 5) AS c_name_init5,
  coalesce(regexp_matches(lower(c_mktsegment), 'build'), false) AS c_mktsegment_isbuild
FROM customer
"""
# NULL-input coalesces mirror the reference exactly: LengthKey emits 0 for
# a nil value (masker.go:100-103 `var length int; if cVal != nil {...}`)
# and RegexPatternBooleanKeys emit "false" (mask_config.go:365-369
# `if cValue != nil && regex.MatchString(...) else "false"`); MobileKey
# stays nil for nil (masker.go:113-115), hence substr keeps NULL.


@query("mask_pipeline", MASK_ORACLE, survey_ref="P5,P7,P8,P9,P10,P12,P14,P16")
def mask_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full masking suite on the customer table, via the engine's
    config-compiled planner (masker.go semantics; sha256 because the DuckDB
    oracle lacks sha1 — algorithm is config, semantics identical)."""
    cfg = MaskConfig(
        salt=MASK_SALT,
        algo="sha256",
        tables={
            "customer": TableMaskRules(
                non_pii_keys=["c_custkey"],
                conditional_non_pii_keys={"c_mktsegment": ["BUILDING"]},
                dependent_non_pii_keys={"c_name": {"c_mktsegment": ["AUTOMOBILE", "MACHINERY"]}},
                length_keys=["c_name"],
                mobile_keys=["c_name"],
                regex_pattern_boolean_keys={"c_mktsegment": {"isbuild": "build"}},
            )
        },
    )
    cust = load_table(spark, sf_dir, "customer")
    out = apply_mask(cust, cfg, "customer")
    # c_custkey back to long so schema lines up with the SQL oracle
    return out.withColumn("c_custkey", F.col("c_custkey").cast("long"))


# --- Aggregations (§2.5) ----------------------------------------------------


@query(
    "agg_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(1 - l_discount AS DECIMAL(14,2))) AS DOUBLE) AS sum_disc_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey_ref="A1,§2.5",
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary; decimal-exact sums (hash aggregate
    with map-side partial agg; filter pushed to the parquet scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(14,2)")).cast("double").alias("sum_base_price"),
            F.sum(
                F.col("l_extendedprice").cast("decimal(14,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(14,2)")
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "agg_rollup_orders",
    """
    SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
    survey_ref="§2.5 rollup",
)
def agg_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same two-level treatment as agg_cube_lineitem (round 15, guide
    §2.3): the rollup's Expand(×3) runs over the (priority, status)
    pre-aggregate instead of every order row; Σ of exact partials is
    value-identical."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("_n"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)")).alias("_s"),
    )
    return base.rollup("o_orderpriority", "o_orderstatus").agg(
        F.sum("_n").alias("n_orders"),
        F.sum("_s").cast("double").alias("total_price"),
    )


@query(
    "agg_cube_lineitem",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    survey_ref="§2.5 cube",
)
def agg_cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 15 (guide §2.3 "aggregate before you shuffle"): Spark plans a
    cube as Expand(×4 grouping sets) BELOW the partial aggregate, so every
    input row was copied four times (2.4M expanded rows at sf0.1; 4× the
    corpus at any scale). count/sum decompose over partials, so the cube
    now runs over a plain (returnflag, linestatus) pre-aggregate — the
    Expand sees ~|groups| rows instead of the corpus. count(*) = Σ partial
    counts and the decimal partial sums are exact/associative → identical
    values. Measured 0.42x (probe, rows identical); oracle exact."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("_n"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("_s"),
    )
    return base.cube("l_returnflag", "l_linestatus").agg(
        F.sum("_n").alias("n"),
        F.sum("_s").cast("double").alias("sum_qty"),
    )


@query(
    "agg_distinct_counts",
    """
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS distinct_parts,
           count(DISTINCT l_suppkey) AS distinct_supps
    FROM lineitem GROUP BY l_returnflag
    """,
    survey_ref="A3,§2.5 distinct",
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_supps"),
    )


# --- Joins (§2.6) -----------------------------------------------------------


@query(
    "join_revenue_by_nation",
    """
    SELECT n.n_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(14,2)) * CAST(1 - l.l_discount AS DECIMAL(14,2))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    survey_ref="J3,§2.6",
)
def join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dims star join; both dims broadcast (no shuffle of the fact
    table at any scale — exactly the plan you want at 100 TB)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(14,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(14,2)")
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "join_semi_discounted",
    """
    SELECT o.o_orderkey
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.06)
    """,
    survey_ref="J2,§2.6 semi",
)
def join_semi_discounted(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    keys = li.filter(F.col("l_discount") > 0.06).select(F.col("l_orderkey").alias("o_orderkey"))
    return orders.join(keys, ["o_orderkey"], "left_semi").select("o_orderkey")


@query(
    "join_left_outer_nation_customers",
    """
    SELECT n.n_name, count(c.c_custkey) AS n_customers
    FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    survey_ref="J3,§2.6 outer",
)
def join_left_outer_nation_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    return (
        nation.join(cust, cust.c_nationkey == nation.n_nationkey, "left")
        .groupBy("n_name")
        .agg(F.count("c_custkey").alias("n_customers"))
    )


# --- Window functions (§2.7) ------------------------------------------------


@query(
    "window_topk_orders_per_customer",
    """
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders)
    SELECT o_custkey, o_orderkey, rnk FROM ranked WHERE rnk <= 3
    """,
    survey_ref="W1,W4",
)
def window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk")
    )


@query(
    "window_running_total",
    """
    SELECT user_id, event_id,
           CAST(sum(CAST(value AS DECIMAL(12,2)))
                OVER (PARTITION BY user_id ORDER BY event_id) AS DOUBLE) AS running_total
    FROM events
    """,
    survey_ref="W1,§2.7",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(Window.unboundedPreceding, 0)
    return ev.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(12,2)")).over(w).cast("double").alias("running_total"),
    )


@query(
    "window_lag_delta",
    """
    SELECT user_id, event_id,
           epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id) AS delta_us
    FROM events
    """,
    survey_ref="§2.7 lag",
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap per user (sessionization building block)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    us = F.unix_micros(F.col("ts"))
    return ev.select("user_id", "event_id", (us - F.lag(us).over(w)).alias("delta_us"))


# --- Set operations (§2.8) --------------------------------------------------


@query(
    "setop_except_inactive_customers",
    """
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders
    """,
    survey_ref="§2.8",
)
def setop_except_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    ords = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    # subtract == EXCEPT DISTINCT directly; exceptAll().distinct() would add
    # a redundant aggregate
    return cust.subtract(ords)


@query(
    "setop_intersect_buyers_signups",
    """
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'signup'
    """,
    survey_ref="§2.8",
)
def setop_intersect_buyers_signups(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    signups = ev.filter(F.col("event_type") == "signup").select("user_id")
    return buyers.intersect(signups)


@query(
    "setop_union_distinct",
    """
    SELECT user_id FROM events WHERE event_type = 'click'
    UNION
    SELECT user_id FROM events WHERE event_type = 'view'
    """,
    survey_ref="S8 DISTINCT,§2.8",
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    views = ev.filter(F.col("event_type") == "view").select("user_id")
    return clicks.union(views).distinct()


# --- Sorts / limits (§2.7 W4) ----------------------------------------------


@query(
    "topn_orders",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    survey_ref="W4",
)
def topn_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N: Spark plans TakeOrderedAndProject — per-partition heaps, no
    global sort."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


# --- Scalar function surface (§2.9) ----------------------------------------


@query(
    "scalar_string_suite",
    """
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           length(p_name) AS name_len,
           string_split(p_name, ' ')[1] AS first_token,
           concat_ws('|', p_brand, p_type) AS brand_type,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowels,
           trim(p_name) AS name_trim
    FROM part
    """,
    survey_ref="§2.9 string",
)
def scalar_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.split("p_name", " ").getItem(0).alias("first_token"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowels"),
        F.trim("p_name").alias("name_trim"),
    )


@query(
    "scalar_hash_json",
    """
    SELECT event_id,
           md5(props) AS props_md5,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events
    """,
    survey_ref="§2.9 hash/json",
)
def scalar_hash_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.md5("props").alias("props_md5"),
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
    )


@query(
    "scalar_temporal_suite",
    """
    SELECT event_id,
           strftime(ts, '%Y-%m-%d') AS day_str,
           extract(hour FROM ts) AS hr,
           isodow(ts) AS iso_dow,
           date_diff('day', DATE '1970-01-01', ts::date) AS epoch_day,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket
    FROM events
    """,
    survey_ref="P4,§2.9 temporal",
)
def scalar_temporal_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd").alias("day_str"),
        F.hour("ts").cast("long").alias("hr"),
        (F.weekday("ts") + 1).cast("long").alias("iso_dow"),
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).cast("long").alias("epoch_day"),
        F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias("hour_bucket"),
    )


@query(
    "temporal_debezium_roundtrip",
    """
    SELECT event_id,
           strftime(ts::date, '%Y-%m-%d') AS date_from_days,
           strftime(to_timestamp(epoch_ms(ts) // 1000), '%Y-%m-%d %H:%M:%S') || '.' ||
             lpad(((epoch_ms(ts) % 1000))::varchar, 3, '0') AS datetime_ms
    FROM events
    """,
    survey_ref="P4",
)
def temporal_debezium_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 round trip through the engine's Debezium codecs: timestamp →
    epoch encodings → normalize back (message.go:116-266)."""
    from tipoca_stream_spark.functions.temporal import (
        debezium_date,
        debezium_datetime_millis,
        format_datetime,
    )

    ev = load_table(spark, sf_dir, "events")
    days = F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
    ms = F.unix_millis(F.col("ts"))
    return ev.select(
        "event_id",
        F.date_format(debezium_date(days), "yyyy-MM-dd").alias("date_from_days"),
        format_datetime(debezium_datetime_millis(ms), 3).alias("datetime_ms"),
    )


# --- Streaming windowed agg, batch form (T1/T2 analogue) --------------------


@query(
    "events_windowed_agg",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    survey_ref="T1,T2 (batch form)",
)
def events_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation — the batch-mode shape of the streaming
    windowed agg (readStream + window(ts) + watermark in streaming/)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "agg_value_percentiles",
    """
    WITH cents AS (SELECT event_type, round(value * 100)::bigint AS c FROM events)
    SELECT event_type,
           round(quantile_cont(c, 0.5), 6) AS p50_cents,
           round(quantile_cont(c, 0.9), 6) AS p90_cents,
           round(quantile_cont(c, 0.99), 6) AS p99_cents
    FROM cents GROUP BY event_type
    """,
    survey_ref="§2.5 (exact percentiles)",
)
def agg_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per group. Integer-cents trick
    makes the interpolation arithmetic identical across engines (Spark
    `percentile` and DuckDB `quantile_cont` both use the p*(n-1) linear
    definition). At scale this is the one agg that requires a full sort per
    group internally — approx_percentile (see agg_approx_distinct's family)
    is the 100 TB default; the exact form is the oracle-checkable
    baseline."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    pcts = F.percentile(cents, F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return (
        ev.groupBy("event_type")
        .agg(pcts.alias("p"))
        .select(
            "event_type",
            F.round(F.element_at("p", 1), 6).alias("p50_cents"),
            F.round(F.element_at("p", 2), 6).alias("p90_cents"),
            F.round(F.element_at("p", 3), 6).alias("p99_cents"),
        )
    )


# --- hopping (sliding) windows -------------------------------------------------

_HOPPING_ORACLE = """
    WITH hops AS (
      SELECT event_type, value,
             time_bucket(INTERVAL '15 minutes', ts)
               - (k * INTERVAL '15 minutes') AS window_start
      FROM events, unnest(range(0, 4)) AS t(k)
      WHERE ts IS NOT NULL
    )
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*)::BIGINT AS n,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM hops GROUP BY 1, 2
    """


@query(
    "events_hopping_window_agg",
    _HOPPING_ORACLE,
    survey_ref="T1/T2 family: hopping (overlapping) windows, batch form",
)
def events_hopping_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOPPING-window aggregation — 1-hour windows sliding every 15
    minutes, so each event lands in exactly four overlapping windows
    (the smoothing shape dashboards want where tumbling windows flicker).
    Spark's native ``window(ts, '1 hour', '15 minutes')`` does the
    4-window fan-out inside codegen; the oracle reproduces it as an
    explicit unnest over the four epoch-aligned hop starts — both
    engines align buckets to the epoch, so the window sets are
    identical. One map-side-combinable aggregate after a 4× row
    expansion; streaming runs the same expression behind a watermark
    (streaming/pipeline.py)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
