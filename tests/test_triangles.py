"""Triangle-counting operator: hand-built graphs plus a property test
against an itertools brute-force oracle (the degree-ordered orientation
must be invisible in the result)."""

from __future__ import annotations

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tipoca_stream_spark.operators.triangles import triangle_counts


def _counts(spark, edges):
    df = spark.createDataFrame(edges, "a long, b long")
    return {
        r["node"]: r["n_triangles"] for r in triangle_counts(df, "a", "b").collect()
    }


def _brute(edges):
    adj = set()
    nodes = set()
    for a, b in edges:
        if a != b:
            adj.add((min(a, b), max(a, b)))
            nodes.update((a, b))
    out = {}
    for x, y, z in combinations(sorted(nodes), 3):
        if (x, y) in adj and (y, z) in adj and (x, z) in adj:
            for n in (x, y, z):
                out[n] = out.get(n, 0) + 1
    return out


def test_single_triangle(spark):
    assert _counts(spark, [(1, 2), (2, 3), (3, 1)]) == {1: 1, 2: 1, 3: 1}


def test_k4_every_node_in_three(spark):
    edges = list(combinations([1, 2, 3, 4], 2))
    assert _counts(spark, edges) == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_free_graph_is_empty(spark):
    # star + path: no triangles at all
    edges = [(0, i) for i in range(1, 6)] + [(10, 11), (11, 12)]
    assert _counts(spark, edges) == {}


def test_duplicates_reversed_edges_and_self_loops_collapse(spark):
    edges = [(1, 2), (2, 1), (1, 2), (2, 3), (3, 1), (1, 1), (2, 2)]
    assert _counts(spark, edges) == {1: 1, 2: 1, 3: 1}


def test_hub_graph_matches_brute_force(spark):
    # a hub node (worst case for naive orientation) plus random chords
    edges = [(0, i) for i in range(1, 12)] + [
        (1, 2), (2, 3), (3, 4), (5, 6), (7, 8), (1, 6), (4, 9),
    ]
    assert _counts(spark, edges) == _brute(edges)


def test_wedge_split_engaged_matches_default_path(spark):
    # wedge_split_degree_cap=1 forces the hub-split wedge generator
    # (every node with out-degree >= 2 gets chunked + replicated spokes);
    # counts must be identical to the exchange-free default path on a
    # graph with a hub, chords, and triangle-free appendages
    edges = (
        [(0, i) for i in range(1, 12)]
        + [(1, 2), (2, 3), (3, 4), (5, 6), (7, 8), (1, 6), (4, 9), (10, 11)]
        + [(20, 21), (21, 22)]
    )
    df = spark.createDataFrame(edges, "a long, b long")
    split = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(df, "a", "b", wedge_split_degree_cap=1).collect()
    }
    assert split == _brute(edges)
    assert split == _counts(spark, edges)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)),
        min_size=0,
        max_size=45,
    )
)
def test_random_graphs_match_brute_force(spark, edges):
    assert _counts(spark, edges) == _brute(edges)
