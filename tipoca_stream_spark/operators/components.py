"""Connected components over a near-duplicate pair graph — the clustering
step that turns pairwise dedup signals (MinHash/Jaccard/SimHash/exact) into
"keep one per cluster" decisions.

The reference has nothing like this (its dedup is PK latest-wins,
`redshift.go:666-698`); this is a training-data-pipeline extension. The
algorithm is iterative min-label propagation on the DataFrame API:

    label(v) <- min(label(v), min over neighbors u of label(u))

repeated to a fixpoint. Each iteration is one shuffle (join + groupBy-min);
convergence needs O(graph diameter) rounds. Near-dup graphs have tiny
diameters (clusters are cliques-ish around shared content), so in practice
2-4 rounds close. For adversarial long-chain graphs the alternating
large-star/small-star variant gives O(log n) rounds — same join shape, so
the scale ceiling is the same per-round shuffle; we keep the simpler
propagation and cap iterations.

Lineage is truncated each round with ``localCheckpoint`` — without it the
plan doubles per iteration and the driver dies optimizing round 10. On a
real cluster use ``spark.sparkContext.setCheckpointDir`` + ``checkpoint``
for fault-tolerant truncation instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """Return (node, component) where component = min node id reachable.

    Only nodes that appear in at least one edge are labeled (isolated
    nodes never needed deduplication). Self-loops are harmless.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    sym = sym.localCheckpoint(eager=True)  # reused every round — pin it

    labels = (
        sym.select(F.col("a").alias("node")).distinct().withColumn("label", F.col("node"))
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels.withColumnRenamed("node", "a"), "a")
            .groupBy(F.col("b").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.withColumnRenamed("label", "old_label")
            .join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("old_label"), F.coalesce("nbr_label", "old_label")
                ).alias("label"),
                "old_label",
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("label") != F.col("old_label")).limit(1).count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))
