"""Connected-components operator: hand-built graphs with known clusters."""

from __future__ import annotations

from tipoca_stream_spark.operators.components import connected_components


def _labels(spark, edges, max_iter=25):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["component"]
        for r in connected_components(df, max_iter=max_iter).collect()
    }


def test_chain_triangle_and_pair(spark):
    # chain 1-2-3-4 (diameter 3), triangle 20-21-22, pair 10-11
    edges = [(1, 2), (2, 3), (3, 4), (20, 21), (21, 22), (20, 22), (10, 11)]
    got = _labels(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_bridge_merges_clusters(spark):
    # two cliques joined by one bridge edge collapse to one component
    edges = [(5, 6), (6, 7), (100, 101), (101, 102), (7, 100)]
    got = _labels(spark, edges)
    assert set(got.values()) == {5}
    assert set(got) == {5, 6, 7, 100, 101, 102}


def test_self_loops_and_duplicate_edges(spark):
    edges = [(1, 1), (1, 2), (2, 1), (1, 2), (3, 3)]
    got = _labels(spark, edges)
    assert got == {1: 1, 2: 1, 3: 3}


def test_long_chain_converges_in_log_rounds(spark):
    # a 200-node chain needs ~200 rounds with plain propagation; pointer
    # jumping must close it within ~log2 rounds (12 is generous headroom)
    edges = [(i, i + 1) for i in range(200)]
    got = _labels(spark, edges, max_iter=12)
    assert set(got.values()) == {0}
    assert len(got) == 201


def test_frontier_matches_full_propagation(spark):
    """Round 15 pin: the frontier-shrunk propagation (only last round's
    changed labels feed the neighbor-min join) must produce the SAME
    final labels as a full replay of min-label propagation + pointer
    jumping over all labels every round — on a graph mixing a long
    chain (many rounds, shrinking frontier), cliques (1-round close),
    an isolated pair, and duplicate/self edges."""
    edges = (
        [(i, i + 1) for i in range(60)]                # chain, ids 0..60
        + [(100 + a, 100 + b) for a in range(5) for b in range(a + 1, 5)]
        + [(200, 201), (201, 201), (200, 201)]
    )
    got = _labels(spark, edges, max_iter=25)

    # reference: full (non-frontier) propagation replayed in Python
    import collections

    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    label = {v: v for v in adj}
    for _ in range(25):
        new = {}
        for v in adj:
            cands = [label[v], label[label[v]]] + [label[u] for u in adj[v]]
            new[v] = min(cands)
        if new == label:
            break
        label = new
    assert got == label
