"""Usage exporter (SURVEY.md §2.12 O8).

Port of ``pkg/redshift/redshift_exporter.go:25-99``: the reference polls the
warehouse's query history and exposes one gauge per table,

    redshift_scan_query_total{database, schema, tablename, tableid}

which the loader's throttle then queries back through Prometheus to pick a
usage-aware budget (T5, ``loader_handler.go:157-184``). Here the warehouse
is the engine itself, so the collector counts table scans at the engine's
single scan entry point (``sources.tables.load_table`` calls
``record_scan`` when a collector is installed), renders the same exposition
text — no Prometheus client library needed, the text format is a stable
public contract — and plugs straight into ``allocator.Throttler`` as its
``table_queries`` source, closing the same exporter → metric → throttle
loop without the HTTP hop.
"""

from __future__ import annotations

import threading
from collections import Counter
from dataclasses import dataclass, field

METRIC_NAME = "redshift_scan_query_total"  # Namespace_SubSystemScan_query_total
HELP_TEXT = "Total number of redshift queries executed"


@dataclass
class UsageCollector:
    """Thread-safe per-table scan counter with Prometheus text rendering."""

    database: str = "dev"
    schema: str = "public"
    _counts: Counter = field(default_factory=Counter)
    _lock: threading.Lock = field(default_factory=threading.Lock)

    def record_scan(self, table: str) -> None:
        with self._lock:
            self._counts[table.lower()] += 1

    def query_total(self, table: str) -> float:
        """The throttle's budget input (loader_handler.go:158-166 runs this
        exact query against Prometheus)."""
        with self._lock:
            return float(self._counts.get(table.lower(), 0))

    def prometheus_text(self) -> str:
        """Prometheus exposition format, one gauge per table — byte-layout
        compatible with what redshift_exporter.go's collector emits."""
        lines = [f"# HELP {METRIC_NAME} {HELP_TEXT}", f"# TYPE {METRIC_NAME} gauge"]
        with self._lock:
            for i, (table, n) in enumerate(sorted(self._counts.items())):
                lines.append(
                    f'{METRIC_NAME}{{database="{self.database}",'
                    f'schema="{self.schema}",tablename="{table}",tableid="{i}"}} '
                    f"{float(n)}"
                )
        return "\n".join(lines) + "\n"

    def throttle_source(self, table: str):
        """``allocator.Throttler(table_queries=...)`` adapter for one
        table."""
        return lambda: self.query_total(table)


_active: UsageCollector | None = None


def set_usage_collector(collector: UsageCollector | None) -> None:
    """Install the process-wide collector consulted by ``load_table``
    (None uninstalls — scans are then uncounted, exactly the reference's
    redshiftMetrics-disabled mode)."""
    global _active
    _active = collector


def active_collector() -> UsageCollector | None:
    return _active
