"""Canonical testdata table loader.

The driver's synthetic tables (TESTDATA.md) are one parquet file per table.
One wrinkle: ``events.ts`` has shipped in two physical encodings across
driver rounds — parquet TIMESTAMP(NANOS) (which Spark 4 rejects at scan
time unless ``spark.sql.legacy.parquet.nanosAsLong=true``, set in our
session factory, makes it read as epoch-nano longs) and TIMESTAMP(MICROS,
isAdjustedToUTC=false) (which reads as TIMESTAMP_NTZ). Both are normalized
to a plain TimestampType here so every downstream query sees one type;
the session TZ is UTC so both normalizations are value-preserving and
match DuckDB's reading of the same file.
"""

from __future__ import annotations

import os

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


def _is_utc_equivalent(tz: str) -> bool:
    """True when the session zone is UTC under any alias ('Etc/GMT', 'GMT0',
    'Zulu', '+00:00', ...): resolved via zoneinfo by checking the offset is
    zero at two instants half a year apart (a zero-offset zone with DST does
    not exist, but probing both solstices keeps the check airtight rather
    than trusting one sample). Falls back to a literal allowlist for offset
    spellings zoneinfo doesn't resolve."""
    if tz in ("UTC", "Etc/UTC", "GMT", "Z", "+00:00", "+0000", "-00:00", "+00"):
        return True
    try:
        from datetime import datetime, timedelta, timezone
        from zoneinfo import ZoneInfo

        zone = ZoneInfo(tz)
        jan = datetime(2026, 1, 1, tzinfo=timezone.utc).astimezone(zone)
        jul = datetime(2026, 7, 1, tzinfo=timezone.utc).astimezone(zone)
        return jan.utcoffset() == timedelta(0) and jul.utcoffset() == timedelta(0)
    except Exception:
        return False


# round 14: the testdata tables are immutable, so their PHYSICAL schemas
# are static metadata — memoize them per (sf_dir, table) and hand the
# reader an explicit schema, skipping the footer-inference pass that cost
# ~60-100 ms of driver time per load_table call (queries call load_table
# 1-6 times per construction). Schemas only — never data or results.
# Round 15 (ADVICE r14): the key also carries the file's (mtime, size)
# fingerprint so a table REGENERATED at the same path mid-process (e.g. a
# test harness rebuilding fixtures) re-infers instead of silently
# null-filling columns missing from a stale schema. One os.stat per
# load_table call — micro vs the ~60-100 ms inference it replaces.
_SCHEMA_CACHE: dict[tuple[str, str, float, int], T.StructType] = {}


def _table_fingerprint(path: str) -> tuple[float, int]:
    try:
        st = os.stat(path)
        return (st.st_mtime, st.st_size)
    except OSError:
        # directory-style parquet or remote path: stat the dir if possible,
        # else fall back to a constant (immutability assumed, as before)
        return (0.0, 0)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from tipoca_stream_spark.streaming.exporter import active_collector

    collector = active_collector()
    if collector is not None:  # O8: usage metrics from the scan entry point
        collector.record_scan(name)
    path = f"{sf_dir}/{name}.parquet"
    key = (sf_dir, name) + _table_fingerprint(path)
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
    else:
        df = spark.read.schema(schema).parquet(path)
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # integer division: ts nanos ~1.7e18 exceeds double's 2^53 mantissa,
            # so a float divide here is off by ±1 µs
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            # TIMESTAMP(MICROS, isAdjustedToUTC=false) reads as NTZ under
            # Spark 4's inferTimestampNTZ; the session TZ is pinned to UTC so
            # the cast to TimestampType is value-preserving, and functions
            # that demand LTZ (unix_micros, window(), to_utc_timestamp)
            # keep working unchanged. The cast silently SHIFTS values under
            # any other session TZ, so fail loudly instead (sessions built
            # via get_spark always pass — session.py pins UTC).
            tz = spark.conf.get("spark.sql.session.timeZone")
            if not _is_utc_equivalent(tz):
                raise ValueError(
                    f"load_table requires spark.sql.session.timeZone=UTC for the "
                    f"NTZ ts cast to be value-preserving; session has {tz!r}"
                )
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
