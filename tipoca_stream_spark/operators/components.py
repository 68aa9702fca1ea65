"""Connected components over a near-duplicate pair graph — the clustering
step that turns pairwise dedup signals (MinHash/Jaccard/SimHash/exact) into
"keep one per cluster" decisions.

The reference has nothing like this (its dedup is PK latest-wins,
`redshift.go:666-698`); this is a training-data-pipeline extension. The
algorithm is iterative min-label propagation on the DataFrame API:

    label(v) <- min(label(v), min over neighbors u of label(u))

combined with **pointer jumping** (path compression):

    label(v) <- min(label(v), label(label(v)), min over neighbors u of label(u))

The label(label(v)) hop halves any label-chain each round, so convergence
is O(log n) rounds even on adversarial long chains (the same bound the
alternating large-star/small-star construction achieves), while near-dup
graphs — cliques-ish around shared content — still close in 2-4 rounds.
Each round costs two hash joins + one groupBy-min, all keyed shuffles.

Lineage is truncated each round with ``localCheckpoint`` — without it the
plan doubles per iteration and the driver dies optimizing round 10. On a
real cluster use ``spark.sparkContext.setCheckpointDir`` + ``checkpoint``
for fault-tolerant truncation instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tipoca_stream_spark.operators.checkpoint import SPILL_LEVEL


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """Return (node, component) where component = min node id reachable.

    Only nodes that appear in at least one edge are labeled (isolated
    nodes never needed deduplication). Self-loops are harmless.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    # Deliberately a PLAIN pin, not pin_partitioned (round 14, re-measured
    # round 15): this operator's callers (near-dup doc clustering) feed it
    # edge sets that are tiny relative to their LSH upstream, and the
    # fixpoint loop runs many rounds over them. Round 14 measured the
    # static 32-way partitioned pin WORSE (+1.3 s — 32 tasks per round
    # over tiny data); round 15 measured the row-count-sized variant (one
    # partition here) WORSE TOO (ABBA 1.16x — every round's join
    # single-threaded). The per-round sym re-shuffle this shape keeps is
    # node-pair-sized for these callers, not corpus-sized, and AQE sizes
    # each round's post-shuffle side to the actual tiny volume — the
    # partition-count sweet spot is load-dependent and AQE already finds
    # it; a pinned count cannot.
    sym = sym.localCheckpoint(eager=True, storageLevel=SPILL_LEVEL)

    labels = (
        sym.select(F.col("a").alias("node")).distinct().withColumn("label", F.col("node"))
    )
    # FRONTIER shrinking (round 15, VERDICT r14 next #1): only a node whose
    # label CHANGED last round can improve a neighbor this round — an
    # unchanged neighbor's label was already min-ed into every adjacent
    # node the round it last changed (labels only decrease, and every
    # round processes every frontier edge). Joining the edge table against
    # the changed set instead of ALL labels makes each round's propagation
    # join and aggregate shrink with the frontier; per-round label tables
    # are IDENTICAL to the full form (same min over a superset whose extra
    # elements are already-applied values), so convergence takes the same
    # rounds and returns the same labels (pinned by
    # tests/test_components.py::test_frontier_matches_full_propagation).
    # Round 1's frontier is every node (nothing propagated yet).
    frontier = labels
    for _ in range(max_iter):
        nbr_min = (
            sym.join(frontier.withColumnRenamed("node", "a"), "a")
            .groupBy(F.col("b").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        # pointer jumping: label(label(v)) — labels are node ids, so a
        # self-join resolves the second hop
        jump = labels.select(
            F.col("node").alias("label"), F.col("label").alias("jump_label")
        )
        new_labels = (
            labels.withColumnRenamed("label", "old_label")
            .join(nbr_min, "node", "left")
            .join(jump, F.col("old_label") == F.col("label"), "left")
            .select(
                "node",
                F.least(
                    F.col("old_label"),
                    F.coalesce("jump_label", "old_label"),
                    F.coalesce("nbr_label", "old_label"),
                ).alias("label"),
                "old_label",
            )
            # LAZY checkpoint (round 15, VERDICT r14 next #1): the
            # changed-probe below is the round's materializing action —
            # lineage still truncates at plan→RDD conversion, blocks
            # persist as the probe computes them. One job per round
            # instead of a full materialization job PLUS the probe.
            .localCheckpoint(eager=False, storageLevel=SPILL_LEVEL)
        )
        # Full-scan count, NOT limit(1): with a lazy pin the probe is also
        # the materializer, and a limit probe executes incrementally
        # (1 partition, then 4, 16... mini-jobs per round) while leaving
        # unscanned partitions unpersisted for the next round to recompute
        # — measured 1.14-1.27x WORSE (r15 ABBA) than this single
        # aggregate job that scans every partition once, persists every
        # block, and answers the convergence question exactly. Re-adjudicated
        # this session after a family-probe 1.16x reading: focused fresh-JVM
        # ABBA min-of-6 vs the r14 eager+limit form = 0.94x, in-process
        # interleaved min-of-4 lazy_count 5.34 s vs eager_limit 5.72 s vs
        # eager_count 6.42 s — the lazy+full-count shape stands.
        changed_rows = new_labels.filter(F.col("label") != F.col("old_label"))
        changed = changed_rows.count()
        labels = new_labels.select("node", "label")
        # next round's frontier: the nodes that just changed, with their
        # new labels — read from the same persisted pin the probe filled
        frontier = changed_rows.select("node", "label")
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))
