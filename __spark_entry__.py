"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship CDC merge at sf0.001;
``queries()``/``oracle_sql()`` expose the full operator inventory from
``tipoca_stream_spark.plans`` (SURVEY.md §2 + training-data extensions).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _ensure_nanos_conf(spark: SparkSession) -> None:
    """events.ts is parquet TIMESTAMP(NANOS); Spark 4 needs this to scan it
    (sources.tables.load_table then normalizes the long back to timestamp)."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # conf may be fixed on a running session; load_table copes


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full last-write-wins CDC
    merge of the events stream (SURVEY.md §2.3 M1-M6)."""
    _ensure_nanos_conf(spark)
    from tipoca_stream_spark.plans import QUERIES

    return QUERIES["cdc_merge_lww"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from tipoca_stream_spark.plans import QUERIES

    def wrap(qdef):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_nanos_conf(spark)
            return qdef.fn(spark, sf_dir)

        run.__doc__ = qdef.fn.__doc__
        return run

    return {name: wrap(qdef) for name, qdef in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from tipoca_stream_spark.plans import QUERIES

    return {name: qdef.oracle for name, qdef in QUERIES.items() if qdef.oracle is not None}
