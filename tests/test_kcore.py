"""kcore operator vs a brute-force Python peeler on random graphs, plus
fixed-round/fixpoint semantics (operators/kcore.py)."""

from __future__ import annotations

import random

import pytest

from tipoca_stream_spark.operators.kcore import kcore


def _py_kcore(edges, k):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return {n: len(ns) for n, ns in adj.items() if ns}


@pytest.mark.parametrize("seed,k", [(1, 2), (2, 3), (3, 2)])
def test_kcore_fixpoint_matches_python_peeler(spark, seed, k):
    rng = random.Random(seed)
    n = 40
    und = {tuple(sorted((rng.randrange(n), rng.randrange(n)))) for _ in range(120)}
    und = sorted(e for e in und if e[0] != e[1])
    sym = und + [(b, a) for a, b in und]
    e_df = spark.createDataFrame(sym, "src long, dst long")
    got = {r["node"]: r["deg"] for r in kcore(e_df, k, until_stable=True).collect()}
    assert got == _py_kcore(und, k)


def test_fixed_rounds_are_a_prefix_of_the_fixpoint(spark):
    # a chain peels one layer per round: fixed rounds keep strictly more
    # nodes than the fixpoint until convergence
    chain = [(i, i + 1) for i in range(10)]
    sym = chain + [(b, a) for a, b in chain]
    e_df = spark.createDataFrame(sym, "src long, dst long")
    one = kcore(e_df, 2, rounds=1).count()
    stable = kcore(e_df, 2, until_stable=True).count()
    assert stable == 0  # a bare chain has no 2-core
    assert one > 0  # after one peel, inner nodes still look degree-2
