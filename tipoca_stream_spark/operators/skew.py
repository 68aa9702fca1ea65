"""Scale tooling: skew-resistant joins/aggregations and bucketed co-located
joins.

The reference leans on Redshift's distkey for co-location
(redshift.go:311-327) and has no skew story (CDC keys are PKs, near-uniform).
At 100 TB on Spark both matter:

- ``salted_join``: replicate the small side R ways and scatter the skewed
  side across R salt values — a hot key's rows spread over R reducers
  instead of one straggler task. AQE's skew-join handles moderate skew at
  runtime; salting is the explicit fix for pathological keys.
- ``salted_count``: two-stage aggregation (partial per salt → final) for
  skewed group-by keys; for algebraic aggregates Spark's map-side partial
  aggregation already does this — the helper exists for collect-like or
  high-cardinality-value aggs where partials don't collapse.
- ``write_bucketed`` / co-located join: pre-shuffle both tables into the
  same bucket layout so repeated joins on the key are exchange-free
  (Spark's bucketBy ≈ distkey).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed fact to a smaller table with salt-replication.

    skewed gets ``salt = pmod(hash(monotonic row), n)``; small is exploded
    ×n_salts. Join key becomes (key, salt) — hot keys fan out over
    ``n_salts`` tasks. The small side must tolerate ×n replication
    (broadcast-sized or dimension-sized)."""
    salt = F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))
    left = skewed.withColumn("_salt", salt)
    right = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = left.join(right, [key, "_salt"], how)
    return out.drop("_salt")


def salted_count(
    df: DataFrame, group_col: str, n_salts: int = 16
) -> DataFrame:
    """Two-stage count for skewed keys: count per (key, salt) → sum per key.
    Result identical to ``groupBy(key).count()``."""
    salt = F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(group_col, "_salt")
        .agg(F.count("*").alias("_partial"))
    )
    return partial.groupBy(group_col).agg(F.sum("_partial").cast("long").alias("n"))


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Deprecated alias — the full bucketed-table writer (one sorted file
    per bucket, sort elision, bucket pruning) lives in
    sources/bucketed.py; this delegates for round-1 callers."""
    from tipoca_stream_spark.sources.bucketed import write_bucketed as _wb

    _wb(df, table_name, n_buckets, [bucket_col], [sort_col] if sort_col else None)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str) -> DataFrame:
    """Deprecated alias for sources.bucketed.co_located_join."""
    from tipoca_stream_spark.sources.bucketed import co_located_join

    return co_located_join(spark, left_table, right_table, on=[key])


def explain_has_exchange(df: DataFrame) -> bool:
    """Plan probe used by tests and tuning: does this plan shuffle?
    (Detects shuffle exchanges only — a BroadcastExchange moves no
    partitioned data.)"""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan or "Exchange rangepartitioning" in plan
