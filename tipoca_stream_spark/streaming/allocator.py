"""Reload unit allocation (O4) and usage-aware throttle budgets (T5).

Ports of:

- ``controllers/unit_allocator.go:90-216`` — the operator budgets how many
  tables may reload at once (``max_reloading_units``), keeps already-
  reloading topics pinned to their units until they reach realtime,
  fills free capacity with the topics having the LEAST data to catch up
  (ascending last-offset, stable for ties), and groups all realtime topics
  into one "realtime" unit running the main sink spec. The k8s Deployment
  per unit collapses here to a planning structure the Supervisor sizes
  Spark query pools with; the allocation logic is unchanged.
- ``pkg/redshiftloader/loader_handler.go:142-243`` — per-topic throttle
  budgets keyed on (table queried recently?, first load?): hot tables get
  many short waits, cold tables few long ones; reload sink groups are
  never throttled. The Prometheus queries become injected callables.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

MAX_RUNNING_LOADERS = 10  # loader_handler.go:23


def parse_topic(topic: str) -> tuple[str, str, str]:
    db, server, table = topic.split(".", 2)
    return db, server, table


def k8s_compatible_name(name: str) -> str:
    """unit_allocator.go:71-76 name sanitization."""
    return name.replace("_", "-").lower()


def unit_id(topic: str) -> str:
    """unit_allocator.go:78-88: table part, k8s-safe, capped at 20 chars."""
    table = k8s_compatible_name(parse_topic(topic)[2])
    return table[:20]


@dataclass
class DeploymentUnit:
    id: str
    topics: list[str]
    sink_group: str = "reload"  # which spec the unit runs (main for realtime)


def sort_topics_by_last_offset(topics_last: list[tuple[str, int]]) -> list[str]:
    """Ascending last-offset, STABLE for ties (unit_allocator.go:57-68 uses
    sort.SliceStable; the reloading order for equal lag follows input
    order)."""
    return [t for t, _ in sorted(topics_last, key=lambda tl: tl[1])]


def allocate_reloading_units(
    topics: list[str],
    realtime: list[str],
    topics_last: list[tuple[str, int]],
    max_reloading_units: int,
    current_reloading_topics: list[str],
) -> list[DeploymentUnit]:
    """unit_allocator.go:90-175 allocateReloadingUnits.

    1. Already-reloading topics that are not yet realtime keep their unit
       (no shuffling a half-done backfill), up to the cap.
    2. Free capacity fills with non-realtime, not-yet-reloading topics in
       ascending last-offset order — smallest catch-up first.
    3. All realtime topics form one trailing "realtime" unit on the main
       sink spec (not counted against the reloading cap).
    """
    rt = set(realtime)
    units: list[DeploymentUnit] = []
    reloading: set[str] = set()

    for topic in current_reloading_topics:
        if topic in rt:
            continue
        units.append(DeploymentUnit(unit_id(topic), [topic]))
        reloading.add(topic)
        if len(units) >= max_reloading_units:
            break

    if len(units) < max_reloading_units:
        for topic in sort_topics_by_last_offset(topics_last):
            if topic in rt or topic in reloading:
                continue
            if len(units) >= max_reloading_units:
                break
            units.append(DeploymentUnit(unit_id(topic), [topic]))
            reloading.add(topic)

    if realtime:
        units.append(DeploymentUnit("realtime", list(realtime), sink_group="main"))
    return units


def chunk_slice(slice_: list[str], chunk_size: int) -> list[list[str]]:
    """unit_allocator.go:177-196."""
    return [slice_[i : i + chunk_size] for i in range(0, len(slice_), chunk_size)]


def allocate_unit_with_chunks(
    topics: list[str], chunk_size: int, sink_group: str = "main"
) -> list[DeploymentUnit]:
    """unit_allocator.go:198-216: Main/ReloadDupe groups run fixed-size
    chunks with ordinal unit ids."""
    return [
        DeploymentUnit(str(i), chunk, sink_group=sink_group)
        for i, chunk in enumerate(chunk_slice(topics, chunk_size))
    ]


# --- T5: usage-aware throttle budgets ---------------------------------------


@dataclass
class ThrottleBudget:
    max: int  # how many waits before going anyway
    interval: int  # seconds per wait


def throttle_budget(
    first_load: bool, table_queries: float | None
) -> ThrottleBudget:
    """loader_handler.go:146-184 budget table. ``table_queries`` is the
    warehouse scan count for the table over the last day (None = usage
    metrics disabled → flat budgets)."""
    if table_queries is None:
        return ThrottleBudget(120, 15) if first_load else ThrottleBudget(10, 15)
    if table_queries > 0 and first_load:
        return ThrottleBudget(120, 15)  # hot table, first load: 30min max
    if table_queries > 0:
        return ThrottleBudget(3, 10)  # hot steady-state: spread the load
    if first_load:
        return ThrottleBudget(8, 900)  # cold first load: 2h max
    return ThrottleBudget(4, 900)  # cold steady-state: 1h max


@dataclass
class Throttler:
    """loader_handler.go:186-243 throttle loop with the environment
    injected: ``running_loaders()`` returns the fleet-wide running-load
    count (the rsk_loader_running metric), ``table_queries(table)`` the
    usage count (None disables usage-aware budgets), ``sleep`` the wait.
    Returns the number of waits taken; callers proceed afterwards either
    way (budget exhaustion means "go load" in the reference too)."""

    running_loaders: Callable[[], float] | None = None
    table_queries: Callable[[], float | None] | None = None
    sleep: Callable[[int], None] = field(default=lambda s: None)
    max_running_loaders: float = MAX_RUNNING_LOADERS
    seen_topics: set[str] = field(default_factory=set)

    def throttle(self, topic: str, sink_group: str = "main") -> int:
        if sink_group == "reload":  # loader_handler.go:187-190
            return 0
        if self.running_loaders is None:  # no metrics client: never throttle
            return 0
        first_load = topic not in self.seen_topics
        self.seen_topics.add(topic)
        queries = self.table_queries() if self.table_queries else None
        budget = throttle_budget(first_load, queries)
        waits = 0
        while waits < budget.max:
            local = self.running_loaders()
            if local <= self.max_running_loaders:
                return waits
            self.sleep(budget.interval)
            waits += 1
        return waits  # budget exhausted: go load
