"""Canonical testdata table loader.

The driver's synthetic tables (TESTDATA.md) are one parquet file per table.
One wrinkle: ``events.ts`` is written as parquet TIMESTAMP(NANOS), which
Spark 4 rejects at scan time (PARQUET_TYPE_ILLEGAL). With
``spark.sql.legacy.parquet.nanosAsLong=true`` (set in our session factory)
the column reads as a long of epoch-nanos; we normalize it back to a proper
TimestampType here (integer division to micros — same truncation DuckDB
applies, so oracle comparisons line up).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from tipoca_stream_spark.streaming.exporter import active_collector

    collector = active_collector()
    if collector is not None:  # O8: usage metrics from the scan entry point
        collector.record_scan(name)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # integer division: ts nanos ~1.7e18 exceeds double's 2^53 mantissa,
        # so a float divide here is off by ±1 µs
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
