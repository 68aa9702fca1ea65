"""Completing the standard relational surface: full/cross joins, UNION ALL,
unpivot, deterministic mode, and the math/conditional scalar families.

SURVEY.md §2.6 notes the reference only ever emits PK equi-joins; the full
join family (incl. FULL OUTER and CROSS) is part of the engine's own query
surface (§2.5 "full standard aggregation surface" note, BASELINE target).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tipoca_stream_spark.plans.registry import query
from tipoca_stream_spark.sources.tables import load_table


@query(
    "join_full_outer_coverage",
    """
    SELECT c_custkey, c.c_name, o.n_orders
    FROM (SELECT * FROM customer WHERE c_custkey % 3 = 0) c
    FULL OUTER JOIN (
      SELECT o_custkey AS c_custkey, count(*) AS n_orders
      FROM orders WHERE o_custkey % 2 = 0 GROUP BY o_custkey) o
    USING (c_custkey)
    """,
    survey_ref="§2.6 join family: full outer",
)
def join_full_outer_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join with nulls surviving on both sides (the two modulo
    filters guarantee each side has unmatched keys). Shuffle-hash/SMJ with
    AQE; neither side can broadcast a full-outer, so this is the one join
    shape that always shuffles both inputs — sized by key cardinality."""
    customer = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 3 == 0)
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 2 == 0)
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.count("*").alias("n_orders"))
    )
    return customer.join(orders, ["c_custkey"], "full_outer").select(
        "c_custkey", "c_name", "n_orders"
    )


@query(
    "join_cross_region_nation",
    """
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
    survey_ref="§2.6 join family: cross",
)
def join_cross_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of the two smallest dims (5×25) — broadcast nested
    loop; cross joins on big inputs are rejected by design upstream (the
    planner would need an explicit crossJoin call)."""
    region = load_table(spark, sf_dir, "region").select("r_name")
    nation = load_table(spark, sf_dir, "nation").select("n_name")
    return region.crossJoin(F.broadcast(nation))


@query(
    "setop_union_all_counts",
    """
    SELECT src, count(*) AS n FROM (
      SELECT 'customer' AS src FROM customer
      UNION ALL SELECT 'supplier' AS src FROM supplier
      UNION ALL SELECT 'part' AS src FROM part)
    GROUP BY src
    """,
    survey_ref="§2.8 set ops: union all",
)
def setop_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics — no dedup shuffle, unlike §2.8's DISTINCT
    variants); the per-source count collapses map-side."""
    parts = [
        load_table(spark, sf_dir, t).select(F.lit(t).alias("src"))
        for t in ("customer", "supplier", "part")
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.groupBy("src").agg(F.count("*").alias("n"))


@query(
    "unpivot_order_measures",
    """
    SELECT o_orderkey, measure, round(val, 4) AS val
    FROM (
      SELECT o_orderkey,
             CAST(o_totalprice AS DOUBLE) AS totalprice,
             CAST(o_custkey AS DOUBLE) AS custkey
      FROM orders WHERE o_orderkey <= 1000)
    UNPIVOT (val FOR measure IN (totalprice, custkey))
    """,
    survey_ref="§2.5 reshape: unpivot/melt",
)
def unpivot_order_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (the inverse of `pivot_qty_by_status`): pure
    projection+explode, no shuffle — row count multiplies by the measure
    count, column count shrinks, scan stays pruned to the measures."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 1000)
        .select(
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("totalprice"),
            F.col("o_custkey").cast("double").alias("custkey"),
        )
    )
    return orders.unpivot(
        ["o_orderkey"], ["totalprice", "custkey"], "measure", "val"
    ).select("o_orderkey", "measure", F.round("val", 4).alias("val"))


@query(
    "agg_mode_deterministic",
    """
    SELECT l_returnflag, min(l_linestatus) FILTER (WHERE cnt = max_cnt) AS mode_linestatus
    FROM (
      SELECT l_returnflag, l_linestatus, cnt, max(cnt) OVER (PARTITION BY l_returnflag) AS max_cnt
      FROM (SELECT l_returnflag, l_linestatus, count(*) AS cnt
            FROM lineitem GROUP BY l_returnflag, l_linestatus))
    GROUP BY l_returnflag
    """,
    survey_ref="§2.5 mode (deterministic tie-break)",
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode with a deterministic lexicographic tie-break (native
    ``mode()`` breaks ties arbitrarily in both engines, which can never
    hash-match). Two hash aggregates + a tiny window over |groups| rows."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_linestatus").agg(F.count("*").alias("cnt"))
    from pyspark.sql import Window

    w = Window.partitionBy("l_returnflag")
    return (
        counts.withColumn("max_cnt", F.max("cnt").over(w))
        .filter(F.col("cnt") == F.col("max_cnt"))
        .groupBy("l_returnflag")
        .agg(F.min("l_linestatus").alias("mode_linestatus"))
    )


@query(
    "scalar_math_suite",
    """
    SELECT l_orderkey, l_linenumber,
           round(abs(l_discount - 0.05), 6)            AS abs_d,
           round(power(l_quantity, 2), 6)              AS qty_sq,
           round(sqrt(l_extendedprice), 6)             AS price_sqrt,
           round(ln(l_extendedprice), 6)               AS price_ln,
           round(exp(l_discount), 6)                   AS disc_exp,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT)  AS price_k_ceil,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
           mod(l_orderkey, 7)                          AS key_mod
    FROM lineitem WHERE l_orderkey <= 500
    """,
    survey_ref="§2.9 math scalar family",
)
def scalar_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar family (abs/power/sqrt/ln/exp/ceil/floor/mod) — all
    whole-stage-codegen builtins; rounded to 6 places because ln/exp last-bit
    behavior may differ across libm builds."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 500)
    ep = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("abs_d"),
        F.round(F.pow(F.col("l_quantity"), 2), 6).alias("qty_sq"),
        F.round(F.sqrt(ep), 6).alias("price_sqrt"),
        F.round(F.log(ep), 6).alias("price_ln"),
        F.round(F.exp(F.col("l_discount")), 6).alias("disc_exp"),
        F.ceil(ep / 1000).cast("long").alias("price_k_ceil"),
        F.floor(ep / 1000).cast("long").alias("price_k_floor"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@query(
    "agg_q6_forecast_revenue",
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(l_discount AS DECIMAL(14,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    survey_ref="§2.5 TPC-H Q6 shape (pushdown showcase)",
)
def agg_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: every predicate is sargable and reaches the parquet scan
    (PushedFilters carries all four), the aggregation is a single partial
    +final sum — the canonical scan-bound query. Decimal-exact product so
    both engines agree bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(14,2)")
                * F.col("l_discount").cast("decimal(14,2)")
            )
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "scalar_conditional_suite",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 100000 THEN 'big'
                WHEN o_totalprice > 10000  THEN 'mid'
                ELSE 'small' END                          AS size_class,
           coalesce(nullif(o_orderpriority, '1-URGENT'), '<urgent>') AS prio_or_marker,
           greatest(o_custkey, 1000)                      AS cust_floor,
           least(CAST(o_totalprice AS DOUBLE), 50000.0)   AS price_cap,
           (o_orderstatus = 'F' AND o_totalprice > 1000)  AS closed_big
    FROM orders WHERE o_orderkey <= 2000
    """,
    survey_ref="§2.9 conditional scalar family",
)
def scalar_conditional_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: CASE/coalesce/nullif/greatest/least/boolean
    algebra — constant-folded and codegen'd by Catalyst."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 100000, "big")
        .when(F.col("o_totalprice") > 10000, "mid")
        .otherwise("small")
        .alias("size_class"),
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")), F.lit("<urgent>")
        ).alias("prio_or_marker"),
        F.greatest(F.col("o_custkey"), F.lit(1000)).alias("cust_floor"),
        F.least(F.col("o_totalprice").cast("double"), F.lit(50000.0)).alias("price_cap"),
        ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 1000)).alias(
            "closed_big"
        ),
    )


@query(
    "scalar_array_suite",
    """
    WITH base AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
                  WHERE doc_id <= 200)
    SELECT doc_id,
           len(w)::int                                        AS n,
           list_contains(w, 'the')                            AS has_the,
           list_position(w, 'the')::int                       AS the_pos,
           w[1]                                               AS first_word,
           w[len(w)]                                          AS last_word,
           array_to_string(list_sort(list_distinct(w)), ',')  AS sorted_distinct,
           array_to_string(list_reverse(w), ',')              AS reversed,
           array_to_string(w[2:4], ',')                       AS slice_2_3,
           len(list_filter(w, x -> length(x) > 4))::int       AS n_long_words,
           list_aggregate(list_transform(w, x -> length(x)), 'sum')::bigint AS total_chars
    FROM base
    """,
    survey_ref="§2.9 array/higher-order function family",
)
def scalar_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + higher-order function family (size/contains/position/
    element_at/sort/distinct/reverse/slice/filter/transform/aggregate) —
    all JVM-side builtins; the fold is the same deterministic left-fold both
    engines implement.

    Cross-engine notes baked into the oracle: both engines return 0 for a
    position miss; DuckDB slices clamp with inclusive ends (w[2:4] ==
    Spark slice(w,2,3)); arrays render to CSV strings so the value-hash
    covers element order."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 200)
    w = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(w).cast("int").alias("n"),
        F.array_contains(w, "the").alias("has_the"),
        F.array_position(w, "the").cast("int").alias("the_pos"),
        F.element_at(w, 1).alias("first_word"),
        F.element_at(w, -1).alias("last_word"),
        F.concat_ws(",", F.array_sort(F.array_distinct(w))).alias("sorted_distinct"),
        F.concat_ws(",", F.reverse(w)).alias("reversed"),
        F.concat_ws(",", F.slice(w, 2, 3)).alias("slice_2_3"),
        F.size(F.filter(w, lambda x: F.length(x) > 4)).cast("int").alias("n_long_words"),
        F.aggregate(
            F.transform(w, lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
    )


@query(
    "scalar_map_suite",
    """
    SELECT doc_id,
           element_at(m, 'lang')[1]                          AS lang_val,
           element_at(m, 'source')[1]                        AS source_val,
           element_at(m, 'missing')[1]                       AS missing_val,
           array_to_string(list_sort(map_keys(m)), ',')      AS keys_sorted,
           cardinality(m)::int                               AS n_entries
    FROM (SELECT doc_id, MAP {'lang': lang, 'source': source} AS m
          FROM documents WHERE doc_id <= 200)
    """,
    survey_ref="§2.9 map function family",
)
def scalar_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map function family (create_map/element_at/map_keys/cardinality);
    missing-key lookup is NULL in both engines."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 200)
    m = F.create_map(F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source"))
    return docs.select(
        "doc_id",
        F.element_at(m, "lang").alias("lang_val"),
        F.element_at(m, "source").alias("source_val"),
        F.element_at(m, "missing").alias("missing_val"),
        F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("keys_sorted"),
        F.size(m).cast("int").alias("n_entries"),
    )


@query(
    "window_frame_suite",
    """
    WITH e AS (SELECT user_id, event_id, round(value * 100)::bigint AS c FROM events
               WHERE user_id <= 50)
    SELECT user_id, event_id,
           CAST(sum(c) OVER (PARTITION BY user_id ORDER BY event_id
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS moving_sum3,
           round(avg(c) OVER (PARTITION BY user_id ORDER BY event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg3,
           first_value(c) OVER (PARTITION BY user_id ORDER BY event_id
                                ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS prev_or_self,
           nth_value(c, 2) OVER (PARTITION BY user_id ORDER BY event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_c,
           round(cume_dist() OVER (PARTITION BY user_id ORDER BY c, event_id), 6) AS cdist,
           CAST(sum(c) OVER (PARTITION BY user_id ORDER BY c
                        RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS BIGINT) AS range_sum_100
    FROM e
    """,
    survey_ref="§2.7 frame family",
)
def window_frame_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window FRAME family: ROWS sliding sums/avgs, bounded first_value,
    full-frame nth_value, cume_dist, and a numeric RANGE frame — frames are
    where window state size is decided, so pinning them cross-engine
    matters. Integer cents keep every aggregate exact."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 50)
    c = F.round(F.col("value") * 100).cast("long")
    base = ev.select("user_id", "event_id", c.alias("c"))
    w_rows = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-2, 0)
    w_near = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-1, 1)
    w_full = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_cd = Window.partitionBy("user_id").orderBy("c", "event_id")
    w_range = Window.partitionBy("user_id").orderBy("c").rangeBetween(-100, 0)
    return base.select(
        "user_id",
        "event_id",
        F.sum("c").over(w_rows).alias("moving_sum3"),
        F.round(F.avg("c").over(w_rows), 6).alias("moving_avg3"),
        F.first("c").over(w_near).alias("prev_or_self"),
        F.nth_value("c", 2).over(w_full).alias("second_c"),
        F.round(F.cume_dist().over(w_cd), 6).alias("cdist"),
        F.sum("c").over(w_range).alias("range_sum_100"),
    )


@query(
    "agg_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n,
           CAST(sum(round(o_totalprice * 100)::bigint) AS BIGINT) AS total_cents,
           grouping(o_orderstatus)::int AS g_status,
           grouping(o_orderpriority)::int AS g_priority
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    survey_ref="§2.5 grouping sets",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (disjoint roll-ups + grand total) with
    grouping() flags — the general form behind rollup/cube; one expand +
    partial-aggregate shuffle, same as cube."""
    # {df} binding: invocation-unique view, no session-global name race
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority
        FROM {orders}
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """,
        orders=load_table(spark, sf_dir, "orders"),
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

_PIVOT_COLS = ", ".join(
    f"count(*) FILTER (WHERE event_type = '{t}') AS n_{t}" for t in EVENT_TYPES
)


@query(
    "agg_pivot_events",
    f"""
    SELECT user_id % 10 AS cohort, {_PIVOT_COLS}
    FROM events GROUP BY user_id % 10
    """,
    survey_ref="§2.5 pivot",
)
def agg_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide) with an explicit value list — the explicit list is
    the scale-safe form (no extra pass to discover distinct values) and
    compiles to one hash aggregate with FILTERed counts, the same plan the
    oracle's FILTER clauses describe."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy((F.col("user_id") % 10).alias("cohort"))
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    renamed = out.select(
        "cohort", *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in EVENT_TYPES]
    )
    return renamed


@query(
    "scalar_string_suite2",
    """
    SELECT p_partkey,
           lpad(p_brand, 12, '*')                AS brand_lpad,
           rpad(p_brand, 12, '*')                AS brand_rpad,
           translate(p_type, 'aeiou', 'AEIOU')   AS type_upvowel,
           repeat(p_brand, 2)                    AS brand_twice,
           reverse(p_name)                       AS name_rev,
           strpos(p_type, 'BRASS')::int          AS brass_pos,
           left(p_name, 5)                       AS name_left5,
           right(p_name, 5)                      AS name_right5,
           replace(p_type, ' ', '_')             AS type_snake
    FROM part WHERE p_partkey <= 500
    """,
    survey_ref="§2.9 string family 2",
)
def scalar_string_suite2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string family: pad/translate/repeat/reverse/locate/left/right/
    replace — all codegen builtins with identical semantics across engines
    (locate/strpos are 1-based, 0 on miss)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return part.select(
        "p_partkey",
        F.lpad("p_brand", 12, "*").alias("brand_lpad"),
        F.rpad("p_brand", 12, "*").alias("brand_rpad"),
        F.translate("p_type", "aeiou", "AEIOU").alias("type_upvowel"),
        F.repeat("p_brand", 2).alias("brand_twice"),
        F.reverse("p_name").alias("name_rev"),
        F.locate("BRASS", F.col("p_type")).cast("int").alias("brass_pos"),
        F.substring("p_name", 1, 5).alias("name_left5"),
        F.col("p_name").substr(F.length("p_name") - 4, F.lit(5)).alias("name_right5"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
    )


@query(
    "scalar_date_suite2",
    """
    SELECT event_id,
           strftime(ts::date + INTERVAL 3 MONTH, '%Y-%m-%d')  AS plus_3mo,
           strftime(last_day(ts::date), '%Y-%m-%d')           AS month_end,
           strftime(date_trunc('month', ts::date), '%Y-%m-%d') AS month_start,
           date_diff('day', DATE '1995-06-01', ts::date)      AS days_since,
           strftime(ts::date - INTERVAL 45 DAY, '%Y-%m-%d')   AS minus_45d,
           extract(quarter FROM ts)::int                      AS qtr
    FROM events WHERE event_id <= 2000
    """,
    survey_ref="§2.9 date arithmetic family",
)
def scalar_date_suite2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic family: add_months/last_day/trunc/datediff/date_sub/
    quarter. Calendar-aware arithmetic (month ends clamp) is where engines
    historically diverge — pinned here."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    d = F.to_date("ts")
    return ev.select(
        "event_id",
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus_3mo"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.trunc(d, "month"), "yyyy-MM-dd").alias("month_start"),
        F.datediff(d, F.lit("1995-06-01").cast("date")).cast("long").alias("days_since"),
        F.date_format(F.date_sub(d, 45), "yyyy-MM-dd").alias("minus_45d"),
        F.quarter("ts").cast("int").alias("qtr"),
    )


@query(
    "subquery_suite",
    """
    SELECT c.c_custkey, c.c_mktsegment,
           CAST(c.c_acctbal AS DOUBLE) AS acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderstatus = 'O')
      AND c.c_nationkey IN (SELECT n_nationkey FROM nation
                            WHERE n_regionkey = 1)
      AND c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_mktsegment = c.c_mktsegment)
    """,
    survey_ref="§2.6 subqueries (EXISTS / IN / correlated scalar)",
)
def subquery_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subquery family: correlated EXISTS (→ semi join), uncorrelated IN
    (→ semi join on a broadcast dim), and a correlated scalar aggregate
    (→ Catalyst rewrites to an aggregate + join on the correlation key).
    Declared in SQL so the optimizer does the decorrelation — the
    Spark-first form; every rewrite is a keyed join, nothing nested-loop."""
    # {df} binding: invocation-unique views, no session-global name race
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment,
               CAST(c.c_acctbal AS DOUBLE) AS acctbal
        FROM {customer} c
        WHERE EXISTS (SELECT 1 FROM {orders} o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderstatus = 'O')
          AND c.c_nationkey IN (SELECT n_nationkey FROM {nation}
                                WHERE n_regionkey = 1)
          AND c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM {customer} c2
                             WHERE c2.c_mktsegment = c.c_mktsegment)
        """,
        customer=load_table(spark, sf_dir, "customer"),
        orders=load_table(spark, sf_dir, "orders"),
        nation=load_table(spark, sf_dir, "nation"),
    )


@query(
    "agg_string_concat",
    """
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS members,
           count(*) AS n
    FROM nation GROUP BY n_regionkey
    """,
    survey_ref="§2.5 ordered string aggregation (LISTAGG)",
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG/string_agg with a deterministic ORDER BY inside the
    aggregate: Spark spells it sort_array(collect_list(...)) → concat_ws.
    collect_list is the one non-algebraic aggregate in the inventory —
    partials still combine map-side as lists, and the per-group payload is
    bounded by group size (dimension-scale here; at fact scale you'd cap
    or sketch it)."""
    nation = load_table(spark, sf_dir, "nation")
    # when-guard: string_agg over an all-NULL group is NULL in SQL;
    # concat_ws over the (NULL-skipping) empty collect_list would be ''
    return nation.groupBy("n_regionkey").agg(
        F.when(
            F.size(F.collect_list("n_name")) > 0,
            F.concat_ws(",", F.sort_array(F.collect_list("n_name"))),
        ).alias("members"),
        F.count("*").alias("n"),
    )


@query(
    "scalar_trycast_suite",
    """
    SELECT event_id,
           try_cast(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           try_cast(event_type AS BIGINT)                        AS bad_int,
           try_cast(CAST(value AS VARCHAR) AS DOUBLE)            AS roundtrip_val,
           coalesce(try_cast(event_type AS BIGINT), -1)          AS defaulted
    FROM events WHERE event_id <= 3000
    """,
    survey_ref="§2.9 error-safe casts (try_cast family)",
)
def scalar_trycast_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe parsing: malformed input → NULL instead of a task
    failure — the property that keeps a 100 TB ingest job alive when one
    row in a billion is garbage. All codegen'd try_cast expressions; the
    JSON path extraction reuses the ingest-side get_json_object."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_id") <= 3000).select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("bigint").alias("k_int"),
        F.col("event_type").try_cast("bigint").alias("bad_int"),
        F.col("value").cast("string").try_cast("double").alias("roundtrip_val"),
        F.coalesce(F.col("event_type").try_cast("bigint"), F.lit(-1)).alias("defaulted"),
    )


@query(
    "scalar_bitwise_suite",
    """
    SELECT c_custkey,
           c_custkey & 255 AS b_and,
           c_custkey | 4096 AS b_or,
           xor(c_custkey, 1365) AS b_xor,
           (c_custkey & 15) << 3 AS b_shl,
           c_custkey >> 2 AS b_shr,
           CAST(bit_count(c_custkey) AS INT) AS b_cnt
    FROM customer
    """,
    survey_ref="§2.9 bitwise operators (mask/shift/popcount)",
)
def scalar_bitwise_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise surface: and/or/xor masks, shifts, popcount — the ops the
    engine's own internals lean on (bloomindex.py's word/mask probes,
    simhash's bit votes) exposed as user scalars. Pure codegen'd
    expressions; DuckDB spells xor as a function (its ^ is exponent),
    Spark as bitwiseXOR — same semantics on BIGINT lanes."""
    c = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    return c.select(
        "c_custkey",
        k.bitwiseAND(F.lit(255)).alias("b_and"),
        k.bitwiseOR(F.lit(4096)).alias("b_or"),
        k.bitwiseXOR(F.lit(1365)).alias("b_xor"),
        F.shiftleft(k.bitwiseAND(F.lit(15)), 3).alias("b_shl"),
        F.shiftright(k, 2).alias("b_shr"),
        F.bit_count(k).cast("int").alias("b_cnt"),
    )
