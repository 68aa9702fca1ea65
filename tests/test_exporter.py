"""Usage exporter (O8) tests: scan counting at the load_table entry point,
Prometheus exposition rendering (redshift_exporter.go:25-99 metric shape),
and the exporter → throttle-budget loop (T5)."""

from __future__ import annotations

from tipoca_stream_spark.sources.tables import load_table
from tipoca_stream_spark.streaming.allocator import Throttler, throttle_budget
from tipoca_stream_spark.streaming.exporter import (
    METRIC_NAME,
    UsageCollector,
    set_usage_collector,
)

SF = "/root/testdata/sf0.001"


def test_load_table_records_scans(spark):
    c = UsageCollector()
    set_usage_collector(c)
    try:
        load_table(spark, SF, "nation")
        load_table(spark, SF, "nation")
        load_table(spark, SF, "region")
    finally:
        set_usage_collector(None)
    assert c.query_total("nation") == 2.0
    assert c.query_total("region") == 1.0
    assert c.query_total("never_scanned") == 0.0


def test_prometheus_text_shape():
    c = UsageCollector(database="dev", schema="public")
    c.record_scan("Orders")  # lowercased like the reference's table names
    c.record_scan("orders")
    text = c.prometheus_text()
    assert f"# TYPE {METRIC_NAME} gauge" in text
    assert (
        f'{METRIC_NAME}{{database="dev",schema="public",tablename="orders",tableid="0"}} 2.0'
        in text
    )


def test_exporter_feeds_throttle_budget():
    # the reference loop: exporter gauge -> prometheus query -> budget pick
    c = UsageCollector()
    c.record_scan("hot_table")
    hot = throttle_budget(first_load=False, table_queries=c.query_total("hot_table"))
    cold = throttle_budget(first_load=False, table_queries=c.query_total("cold_table"))
    assert (hot.max, hot.interval) == (3, 10)  # queried recently: spread load
    assert (cold.max, cold.interval) == (4, 900)  # cold: long waits

    th = Throttler(
        running_loaders=lambda: 0.0,
        table_queries=c.throttle_source("hot_table"),
    )
    assert th.throttle("db.s.hot_table") == 0  # capacity free: no waits
