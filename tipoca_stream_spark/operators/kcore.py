"""k-core peeling: iteratively drop nodes of degree < k.

The density sibling of the graph family — components finds reachability,
LPA finds neighborhoods, triangles count local closure; the k-core is
the maximal subgraph where every node keeps >= k neighbors, the standard
"structurally supported" filter for near-dup cluster cores and link-farm
pruning.

Each round: one degree aggregate + two semi-joins restricting the edge
table to surviving endpoints — all keyed shuffles on node id, lineage
truncated per round (``localCheckpoint``, the components.py discipline).
Peeling converges in at most O(n) rounds but in practice a handful; the
fixed-round form exists so the registered query's DuckDB oracle can
unroll the identical prefix (the graph-family convention — pagerank/LPA/
BFS all pin fixpoint prefixes, not unbounded recursion). ``until_stable``
runs to the true fixpoint for operator use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tipoca_stream_spark.operators.checkpoint import SPILL_LEVEL, pin_partitioned


def _degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy("src").agg(F.count("*").alias("deg"))


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 4,
    until_stable: bool = False,
) -> DataFrame:
    """Return (node, deg): nodes surviving ``rounds`` peels (or the true
    k-core with ``until_stable``) with their degree in the peeled graph.

    ``edges`` must be symmetric (both directions present) — degree is
    out-degree of the symmetrized table. Self-loops count like any edge;
    drop them upstream if the semantics require."""
    # pre-partition on "src" before pinning (AQE-off checkpoint build so
    # the partitioning is actually advertised — checkpoint.py explains):
    # the degree aggregate and the src semi-join both key on it, so the
    # first round reuses the pinned partitioning instead of re-shuffling
    # the edge table (guide §2.4). Later rounds re-pin inside the loop
    # without a repartition — adding one would cost the same edge-sized
    # exchange it saves, so only the initial pin carries the partitioning.
    e = pin_partitioned(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")), "src"
    )
    prev_n = e.count() if until_stable else -1
    i = 0
    while True:
        i += 1
        # keep feeds both semi-joins and so is computed twice per round;
        # an eager localCheckpoint of it MEASURED SLOWER at sf0.1 AND sf1
        # (4.2 s vs 3.3 s / 33 s vs 28 s) — the duplicate aggregate over
        # an already-checkpointed e is cheaper than a per-round
        # materialization action, so the plain form stays
        keep = _degrees(e).filter(F.col("deg") >= k).select("src")
        # src semi first (reuses the pin's hash(src) — no edge exchange),
        # dst semi second (the one unavoidable edge exchange of the round)
        pruned = (
            e.join(keep, "src", "left_semi")
            .join(keep.withColumnRenamed("src", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=True, storageLevel=SPILL_LEVEL)
        )
        e = pruned
        if until_stable:
            # converged when no edge fell this round; prev_n carries the
            # last count forward so each round costs ONE count job
            n = pruned.count()
            if n == prev_n:
                break
            prev_n = n
        elif i >= rounds:
            break
    return _degrees(e).select(F.col("src").alias("node"), "deg")
