"""Label propagation: hand-built graphs plus a property test against a
pure-Python synchronous-LPA reference (most-frequent neighbor label,
smallest-label tie-break, fixed rounds)."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tipoca_stream_spark.operators.labelprop import label_propagation


def _spark_labels(spark, edges, iters=3):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["label"]
        for r in label_propagation(df, iters=iters).collect()
    }


def _reference(edges, iters=3):
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {n: n for n in adj}
    for _ in range(iters):
        nxt = {}
        for n, neigh in adj.items():
            counts = Counter(labels[m] for m in neigh)
            # most frequent, smallest label on ties
            nxt[n] = min(counts, key=lambda lb: (-counts[lb], lb))
        labels = nxt
    return labels


def test_two_cliques_with_bridge(spark):
    # two triangles joined by one bridge: each keeps its own community
    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)]
    got = _spark_labels(spark, edges)
    assert got == _reference(edges)
    assert got[1] == got[2] == got[3]
    assert got[10] == got[11] == got[12]
    assert got[1] != got[10]


def test_star_adopts_hub_smallest_label(spark):
    edges = [(0, i) for i in range(1, 6)]
    got = _spark_labels(spark, edges)
    assert got == _reference(edges)


def test_self_loops_and_duplicates_ignored(spark):
    edges = [(1, 1), (1, 2), (2, 1), (1, 2), (2, 3)]
    assert _spark_labels(spark, edges) == _reference(edges)


def test_zero_iters_is_identity(spark):
    edges = [(1, 2), (2, 3)]
    assert _spark_labels(spark, edges, iters=0) == {1: 1, 2: 2, 3: 3}


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=35,
    )
)
def test_random_graphs_match_reference(spark, edges):
    ref = _reference(edges)
    if not ref:  # all self-loops
        return
    assert _spark_labels(spark, edges) == ref
