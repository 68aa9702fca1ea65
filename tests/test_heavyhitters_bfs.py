"""Operator-level tests for heavy_hitters and bfs_distances.

The registered queries (agg_heavy_hitters, graph_bfs_distances) are
oracle-checked in test_queries_oracle.py; these pin the operator
contracts on adversarial synthetic inputs — skewed/uniform frequency
mixes for the candidate-prune guarantee, random graphs against a pure
Python BFS oracle, and the plan shape of the verify pass.
"""

from __future__ import annotations

import random
from collections import Counter, deque

import pytest
from pyspark.sql import functions as F

from tipoca_stream_spark.operators.bfs import bfs_distances
from tipoca_stream_spark.operators.heavyhitters import heavy_hitters


def _hh_oracle(values, k):
    counts = Counter(values)
    n = len(values)
    return {item: cnt for item, cnt in counts.items() if cnt > n / k}


@pytest.mark.parametrize("seed,k", [(1, 5), (2, 10), (3, 3), (4, 50)])
def test_heavy_hitters_matches_exact_counts(spark, seed, k):
    rng = random.Random(seed)
    # skewed head + uniform tail, shuffled across many partitions so
    # local thresholds differ per partition
    values = [rng.choice([1, 1, 1, 2, 2, 7]) for _ in range(500)]
    values += [rng.randrange(1000, 2000) for _ in range(500)]
    rng.shuffle(values)
    df = spark.createDataFrame([(v,) for v in values], "item long").repartition(7)
    got = {r["item"]: r["cnt"] for r in heavy_hitters(df, "item", k).collect()}
    assert got == _hh_oracle(values, k)


def test_heavy_hitters_ignores_nulls_and_empty(spark):
    df = spark.createDataFrame([(None,), (1,), (1,), (1,), (2,)], "item: long")
    got = {r["item"]: r["cnt"] for r in heavy_hitters(df, "item", 2).collect()}
    assert got == {1: 3}  # 3 > 4/2; NULLs neither counted nor emitted
    empty = spark.createDataFrame([], "item long")
    assert heavy_hitters(empty, "item", 2).count() == 0


def test_heavy_hitters_verify_pass_is_semi_join_on_candidates(spark):
    df = spark.createDataFrame([(i % 3,) for i in range(60)], "item long")
    plan = heavy_hitters(df, "item", 10)._jdf.queryExecution().executedPlan().toString()
    # candidate set is broadcast back; the exact recount must not be a
    # full-cardinality shuffle-heavy join
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def _bfs_oracle(edges, seeds, max_hops):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if dist[u] >= max_hops:
            continue
        for v in adj.get(u, []):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_bfs_matches_python_oracle_on_random_graphs(spark, seed):
    rng = random.Random(seed)
    n = 60
    edges = {(rng.randrange(n), rng.randrange(n)) for _ in range(150)}
    edges = sorted(e for e in edges if e[0] != e[1])
    seeds = sorted(rng.sample(range(n), 3))
    e_df = spark.createDataFrame(edges, "src long, dst long")
    s_df = spark.createDataFrame([(s,) for s in seeds], "node long")
    got = {r["node"]: r["dist"] for r in bfs_distances(e_df, s_df, max_hops=4).collect()}
    assert got == _bfs_oracle(edges, seeds, 4)


def test_bfs_early_exit_and_isolated_seed(spark):
    # chain 0->1->2, seed {0, 9}; 9 has no edges but keeps dist 0
    e_df = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    s_df = spark.createDataFrame([(0,), (9,)], "node long")
    got = {r["node"]: r["dist"] for r in bfs_distances(e_df, s_df, max_hops=10).collect()}
    assert got == {0: 0, 9: 0, 1: 1, 2: 2}  # loop exits once frontier drains


def test_bfs_min_distance_not_first_path(spark):
    # two paths to node 3: length 3 via chain, length 1 direct
    edges = [(0, 1), (1, 2), (2, 3), (0, 3)]
    e_df = spark.createDataFrame(edges, "src long, dst long")
    s_df = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["dist"] for r in bfs_distances(e_df, s_df, max_hops=5).collect()}
    assert got[3] == 1
