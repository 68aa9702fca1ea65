"""Unit-allocator (O4) + throttle-budget (T5) tests, ported scenario-for-
scenario from controllers/unit_allocator_test.go:65-583 and the budget
table in pkg/redshiftloader/loader_handler.go:146-184."""

from __future__ import annotations

from tipoca_stream_spark.streaming.allocator import (
    DeploymentUnit,
    Throttler,
    allocate_reloading_units,
    allocate_unit_with_chunks,
    throttle_budget,
    unit_id,
)

T = lambda n: f"db.inventory.t{n}"


def ids_topics(units):
    return [(u.id, u.topics) for u in units]


def test_first_case_smallest_last_offset_wins():
    units = allocate_reloading_units(
        topics=[T(1), T(2), T(3), T(4)],
        realtime=[],
        topics_last=[(T(1), 1500), (T(2), 1500), (T(3), 1400), (T(4), 1400)],
        max_reloading_units=1,
        current_reloading_topics=[],
    )
    assert ids_topics(units) == [("t3", [T(3)])]


def test_second_case_max3_stable_tie_order():
    units = allocate_reloading_units(
        topics=[T(1), T(2), T(3), T(4)],
        realtime=[],
        topics_last=[(T(1), 1500), (T(2), 1500), (T(3), 1400), (T(4), 1400)],
        max_reloading_units=3,
        current_reloading_topics=[],
    )
    assert ids_topics(units) == [("t3", [T(3)]), ("t4", [T(4)]), ("t1", [T(1)])]


def test_third_case_current_reloading_pinned():
    units = allocate_reloading_units(
        topics=[T(1), T(2), T(3), T(4)],
        realtime=[],
        topics_last=[(T(1), 1500), (T(2), 1500), (T(3), 1400), (T(4), 1400)],
        max_reloading_units=3,
        current_reloading_topics=[T(1), T(2), T(3)],
    )
    assert ids_topics(units) == [("t1", [T(1)]), ("t2", [T(2)]), ("t3", [T(3)])]


def test_fourth_case_lag_change_does_not_shuffle():
    units = allocate_reloading_units(
        topics=[T(1), T(2), T(3), T(4)],
        realtime=[],
        topics_last=[(T(1), 1500), (T(2), 1500), (T(3), 2), (T(4), 1)],
        max_reloading_units=3,
        current_reloading_topics=[T(1), T(2), T(3)],
    )
    assert ids_topics(units) == [("t1", [T(1)]), ("t2", [T(2)]), ("t3", [T(3)])]


def test_fifth_case_realtime_frees_slot_next_moves_in():
    units = allocate_reloading_units(
        topics=[T(1), T(2), T(3), T(4)],
        realtime=[T(3)],
        topics_last=[(T(1), 1500), (T(2), 1500), (T(3), 2), (T(4), 1)],
        max_reloading_units=3,
        current_reloading_topics=[T(1), T(2), T(3)],
    )
    assert ids_topics(units) == [
        ("t1", [T(1)]),
        ("t2", [T(2)]),
        ("t4", [T(4)]),
        ("realtime", [T(3)]),
    ]


def test_sixth_case_all_realtime_single_unit():
    units = allocate_reloading_units(
        topics=[T(1), T(2), T(3), T(4)],
        realtime=[T(1), T(2), T(3), T(4)],
        topics_last=[(T(1), 1), (T(2), 1), (T(3), 2), (T(4), 1)],
        max_reloading_units=3,
        current_reloading_topics=[T(1), T(2), T(4), T(3)],
    )
    assert ids_topics(units) == [("realtime", [T(1), T(2), T(3), T(4)])]
    assert units[0].sink_group == "main"


def test_k8s_name_compatibility():
    units = allocate_reloading_units(
        topics=["db.inventory.t1_aks"],
        realtime=[],
        topics_last=[("db.inventory.t1_aks", 1)],
        max_reloading_units=3,
        current_reloading_topics=[],
    )
    assert ids_topics(units) == [("t1-aks", ["db.inventory.t1_aks"])]
    assert unit_id("db.inventory.a_very_long_table_name_indeed") == "a-very-long-table-na"


def test_units_going_above_max_realtime_not_counted():
    units = allocate_reloading_units(
        topics=[T(n) for n in range(1, 10)],
        realtime=[T(1)],
        topics_last=[(T(1), 1), (T(2), 10), (T(3), 100), (T(4), 1000),
                     (T(5), 10000), (T(6), 20000), (T(7), 100000)],
        max_reloading_units=5,
        current_reloading_topics=[T(1), T(2), T(3), T(4), T(5)],
    )
    assert ids_topics(units) == [
        ("t2", [T(2)]),
        ("t3", [T(3)]),
        ("t4", [T(4)]),
        ("t5", [T(5)]),
        ("t6", [T(6)]),
        ("realtime", [T(1)]),
    ]


def test_chunk_allocation():
    # unit_allocator_test.go:8-63
    units = allocate_unit_with_chunks([T(1), T(2), T(3), T(4)], 100)
    assert ids_topics(units) == [("0", [T(1), T(2), T(3), T(4)])]
    units = allocate_unit_with_chunks([f"t{i}" for i in range(1, 11)], 3)
    assert ids_topics(units) == [
        ("0", ["t1", "t2", "t3"]),
        ("1", ["t4", "t5", "t6"]),
        ("2", ["t7", "t8", "t9"]),
        ("3", ["t10"]),
    ]


# --- throttle budgets (loader_handler.go:146-184) ---------------------------


def test_budget_table_four_branches():
    assert throttle_budget(True, 5.0) == throttle_budget(True, 1.0)
    assert (throttle_budget(True, 5.0).max, throttle_budget(True, 5.0).interval) == (120, 15)
    assert (throttle_budget(False, 5.0).max, throttle_budget(False, 5.0).interval) == (3, 10)
    assert (throttle_budget(True, 0.0).max, throttle_budget(True, 0.0).interval) == (8, 900)
    assert (throttle_budget(False, 0.0).max, throttle_budget(False, 0.0).interval) == (4, 900)
    # metrics disabled: flat budgets (loader_handler.go:148-156)
    assert (throttle_budget(True, None).max, throttle_budget(True, None).interval) == (120, 15)
    assert (throttle_budget(False, None).max, throttle_budget(False, None).interval) == (10, 15)


def test_throttler_reload_sinkgroup_never_throttled():
    th = Throttler(running_loaders=lambda: 100.0)
    assert th.throttle("db.s.t", sink_group="reload") == 0


def test_throttler_no_metrics_never_throttles():
    th = Throttler(running_loaders=None)
    assert th.throttle("db.s.t") == 0


def test_throttler_waits_until_capacity_or_budget():
    calls = {"n": 0}

    def loaders():
        calls["n"] += 1
        return 20.0 if calls["n"] <= 2 else 1.0  # free on the 3rd check

    slept = []
    th = Throttler(
        running_loaders=loaders, table_queries=lambda: 5.0, sleep=slept.append
    )
    waits = th.throttle("db.s.hot")  # first load of a hot table: (120, 15)
    assert waits == 2
    assert slept == [15, 15]

    # steady-state hot budget (3, 10): overloaded forever -> exhaust and go
    th2 = Throttler(
        running_loaders=lambda: 99.0, table_queries=lambda: 5.0, sleep=slept.append
    )
    th2.throttle("db.s.hot")  # first load consumes (120,15)... cap makes it exhaust
    th2.seen_topics.add("db.s.hot")
    slept.clear()
    waits = th2.throttle("db.s.hot")
    assert waits == 3
    assert slept == [10, 10, 10]
