"""Synchronous label propagation (community detection) on the DataFrame
API — the companion to connected components (operators/components.py):
components finds *reachability* clusters, LPA finds *densely connected*
communities inside them, the standard cheap community detector for
near-duplicate template families and co-purchase neighborhoods.

The reference system has no graph operators; this is a training-data-
pipeline extension like pagerank.py / triangles.py.

Semantics (deterministic, SQL-expressible): every node starts labeled
with its own id; each synchronous round, every node adopts the most
frequent label among its neighbors, ties broken by smallest label;
isolated nodes keep their label. A FIXED iteration count keeps the
result reproducible and lets an external SQL oracle unroll the rounds as
chained CTEs (graph.py does exactly that) — convergence-threshold
variants belong in a driver loop around this.

Execution shape per round: one keyed join (edges ⋈ labels on src) and two
aggregates — (node, label) count, then a ``min_by`` argmax per node that
rides the same shuffle key, combining map-side. Labels are checkpointed
per round (lineage truncation, same discipline as components/pagerank).
At 10^10 edges each round is one edge-sized shuffle plus node-sized
aggregates; nothing node-cardinality touches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tipoca_stream_spark.operators.checkpoint import SPILL_LEVEL, pin_partitioned


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    edges_canonical: bool = False,
) -> DataFrame:
    """Fixed-round synchronous LPA over an undirected edge list (pass each
    edge once; both directions are generated here). Returns (node, label).

    ``edges_canonical=True`` (round 14): the caller guarantees distinct
    ``src < dst`` pairs, making the symmetrized union disjoint — the
    de-dup exchange is skipped. Neighbor-label counts depend on edge
    multiplicity, so the operator cannot drop the distinct for arbitrary
    inputs (guide §2.4).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col(src) != F.col(dst)
    )
    sym = e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    if not edges_canonical:
        sym = sym.distinct()
    # pre-partition on the per-round join key ("b" — labels attach to the
    # neighbor side) before pinning, so the edge table is shuffled once
    # here instead of once per round (guide §2.4); distinct()'s (a, b)
    # partitioning is unusable by the round join. pin_partitioned builds
    # the checkpoint AQE-off so the partitioning is actually advertised
    # (checkpoint.py explains).
    sym = pin_partitioned(sym, "b")
    nodes = sym.select(F.col("a").alias("node")).distinct().localCheckpoint(
        eager=True, storageLevel=SPILL_LEVEL
    )
    labels = nodes.withColumn("label", F.col("node"))
    for _ in range(iters):
        neigh = sym.join(
            labels.select(
                F.col("node").alias("b"), F.col("label").alias("nl")
            ),
            "b",
        )
        counts = neigh.groupBy(F.col("a").alias("node"), F.col("nl")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        # argmax by (cnt desc, label asc): min_by over the struct
        # (-cnt, label) — lexicographic struct ordering gives the
        # deterministic winner in ONE reduce, no window sort
        best = counts.groupBy("node").agg(
            F.min_by(
                "nl", F.struct((-F.col("cnt")).alias("neg"), F.col("nl"))
            ).alias("new_label")
        )
        labels = (
            nodes.join(labels, "node")
            .join(best, "node", "left")
            .select(
                "node",
                F.coalesce("new_label", "label").alias("label"),
            )
            # LAZY checkpoint (round 15, VERDICT r14 next #1): lineage
            # still truncates at plan→RDD conversion, but the per-round
            # materialization job is gone — the caller's one action
            # computes all rounds, persisting each round's blocks as
            # they are produced (the round's two consumers — the next
            # neigh join and the carry join — read the persisted blocks)
            .localCheckpoint(eager=False, storageLevel=SPILL_LEVEL)
        )
    return labels
