"""Range joins, full-frame window navigation, and histogram profiling.

The reference has no range joins (all its joins are PK equi-joins,
SURVEY.md §2.6); these extend the query surface the way a training-data
pipeline needs: banding a measure into tiers, first/last-event navigation,
and value-distribution profiling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tipoca_stream_spark.plans.registry import query
from tipoca_stream_spark.sources.tables import load_table

TIERS = [
    (float("-inf"), 10.0, "low"),
    (10.0, 100.0, "mid"),
    (100.0, 1000.0, "high"),
    (1000.0, float("inf"), "extreme"),
]

NEG_INF = "CAST('-infinity' AS DOUBLE)"
POS_INF = "CAST('infinity' AS DOUBLE)"
_TIER_VALUES = ", ".join(
    "({}, {}, '{}')".format(
        NEG_INF if lo == float("-inf") else lo,
        POS_INF if hi == float("inf") else hi,
        name,
    )
    for lo, hi, name in TIERS
)


@query(
    "join_range_value_tiers",
    f"""
    SELECT t.tier, count(*) AS n, round(sum(e.value), 4) AS total_value
    FROM events e
    JOIN (VALUES {_TIER_VALUES}) AS t(lo, hi, tier)
      ON e.value >= t.lo AND e.value < t.hi
    GROUP BY t.tier
    """,
    survey_ref="extension: range join (banding)",
)
def join_range_value_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (non-equi) join of a measure into tier bands. The band table is
    a literal broadcast — the plan is BroadcastNestedLoopJoin over one scan
    of the fact side, so at 100 TB it stays a map-side operation with no
    shuffle of the events table (the groupBy then shuffles |tiers| rows per
    partition)."""
    ev = load_table(spark, sf_dir, "events").select("value")
    tiers = spark.createDataFrame(TIERS, "lo double, hi double, tier string")
    return (
        ev.join(
            F.broadcast(tiers),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("tier")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )


@query(
    "window_first_last",
    """
    SELECT DISTINCT o_custkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)  OVER w AS last_order,
           nth_value(o_orderkey, 2) OVER w AS second_order
    FROM orders
    WINDOW w AS (
      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    survey_ref="§2.7 window navigation (first/last/nth)",
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-frame window navigation: first/last/nth order per customer.
    The tie-break on o_orderkey makes the result deterministic (same-day
    orders would otherwise make first/last nondeterministic in both
    engines)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    ).distinct()


@query(
    "events_value_histogram",
    """
    SELECT CAST(floor(value / 50) AS BIGINT) AS bin, count(*) AS n
    FROM events
    GROUP BY bin
    """,
    survey_ref="extension: distribution profiling",
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of the value distribution — floor-division
    binning is exact in both engines (same IEEE double semantics), and the
    aggregation is the textbook map-side-combine shape: the shuffle carries
    |bins| rows per partition regardless of input size."""
    ev = load_table(spark, sf_dir, "events").select("value")
    return (
        ev.groupBy(F.floor(F.col("value") / 50).cast("long").alias("bin"))
        .agg(F.count("*").alias("n"))
    )
