"""Percentiles, edit-distance near-dup, and outlier detection — quality /
analysis surface on top of the exact-moment machinery."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tipoca_stream_spark.plans.registry import query
from tipoca_stream_spark.sources.tables import load_table

LEV_MAX = 3


@query(
    "agg_percentiles",
    """
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 6) AS p90,
           round(quantile_cont(o_totalprice, 0.99), 6) AS p99
    FROM orders GROUP BY o_orderstatus
    """,
    survey_ref="§2.5 percentiles",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles — Spark ``percentile`` and DuckDB
    ``quantile_cont`` share the (1-d)·a + d·b definition, so values match
    to the last bit (rounded only as belt-and-braces)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 6).alias("p99"),
    )


@query(
    "dedup_levenshtein_pairs",
    f"""
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           levenshtein(a.p_name, b.p_name) AS edit_dist
    FROM part a JOIN part b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= {LEV_MAX}
    """,
    survey_ref="training: edit-distance near-dup",
)
def dedup_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup within a blocking key (p_brand bounds the
    candidate space the way an LSH bucket would at scale); ``levenshtein``
    is a JVM builtin in both engines with the same definition."""
    part = load_table(spark, sf_dir, "part")
    a = part.select(F.col("p_partkey").alias("key_a"), F.col("p_name").alias("name_a"), "p_brand")
    b = part.select(F.col("p_partkey").alias("key_b"), F.col("p_name").alias("name_b"), "p_brand")
    return (
        a.join(b, "p_brand")
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b", F.levenshtein("name_a", "name_b").alias("edit_dist"))
        .filter(F.col("edit_dist") <= LEV_MAX)
    )


@query(
    "events_zscore_outliers",
    """
    WITH m AS (
      SELECT event_type,
             count(*) AS n,
             sum(CAST(round(value * 100) AS BIGINT)::DECIMAL(20,0)) AS sx,
             sum((CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT))::DECIMAL(38,0)) AS sxx
      FROM events GROUP BY event_type),
    stats AS (
      SELECT event_type, n,
             CAST(sx AS DOUBLE) / n / 100 AS mean_v,
             sqrt(((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1)) / 10000) AS std_v
      FROM m)
    SELECT e.event_id, e.event_type, round((e.value - s.mean_v) / s.std_v, 6) AS zscore
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE abs((e.value - s.mean_v) / s.std_v) > 3
    """,
    survey_ref="training: quality/outlier scoring",
)
def events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outliers from exact integer-cent moments; the
    stats side is tiny and broadcast back onto the stream."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    m = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(cents.cast("decimal(20,0)")).alias("sx"),
        F.sum((cents * cents).cast("decimal(38,0)")).alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx").cast("double"), F.col("sxx").cast("double")
    stats = m.select(
        "event_type",
        (sx / n / 100).alias("mean_v"),
        F.sqrt(((sxx - sx * sx / n) / (n - 1)) / 10000).alias("std_v"),
    )
    z = (F.col("value") - F.col("mean_v")) / F.col("std_v")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 3)
        .select("event_id", "event_type", F.round(z, 6).alias("zscore"))
    )
