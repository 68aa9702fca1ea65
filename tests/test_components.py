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
