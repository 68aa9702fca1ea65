"""Incrementally-maintained join view over two CDC-merged tables.

The reference materializes each source table into Redshift and leaves
joins to the warehouse query layer. With the engine owning storage, the
natural next step is maintaining the JOIN itself as data arrives —
classic incremental view maintenance, specialized to the CDC shape:

    J = A ⋈ B on A.join_key = B.join_key

After the per-table merges land a micro-batch, only join keys touched by
either delta can change in J. So the refresh is:

    touched  = keys(ΔA) ∪ keys(ΔB)              -- delta-sized, broadcast
    J'       = J ▷ touched                       -- broadcast ANTI: keep untouched
               ∪ (A' ⋉ touched) ⋈ (B' ⋉ touched) -- recompute only touched keys

The view table is never shuffled (anti/semi joins are broadcast against
the tiny touched-key set); the recompute joins two delta-pruned slices.
At 100 TB with a 1 GiB batch, the rewrite cost is O(batch), not O(view) —
compare a naive refresh, which re-joins two full tables per batch.

Exactly-once: the refreshed-epoch set commits atomically with the view's
version flip (same mechanism as CdcPipeline's T4 guard), so a replayed
batch is a no-op.

Correctness contract (pinned by tests): after every batch,
``view.read() == A'.read() ⋈ B'.read()`` computed from scratch — for any
interleaving of creates/updates/deletes on either side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tipoca_stream_spark.sources.target import ParquetTargetTable


class MaterializedJoin:
    """Maintains ``left ⋈ right`` (inner, equi) as a versioned table.

    ``left``/``right`` are the post-merge CDC targets (latest-wins rows);
    ``refresh(delta_keys, epoch_id)`` is called after each batch with the
    join-key values present in that batch's deltas (either side).
    """

    def __init__(
        self,
        spark: SparkSession,
        view: ParquetTargetTable,
        left: ParquetTargetTable,
        right: ParquetTargetTable,
        join_key: str,
    ):
        self.spark = spark
        self.view = view
        self.left = left
        self.right = right
        self.join_key = join_key

    def _epochs(self) -> set[int]:
        return set(self.view.read_metadata().get("join_epochs", []))

    def full_join(self) -> DataFrame:
        """The from-scratch join — used for bootstrap and as the test
        oracle."""
        return self.left.read().join(self.right.read(), self.join_key)

    def refresh(self, delta_keys: DataFrame, epoch_id: int = 0) -> None:
        """Incremental maintenance: ``delta_keys`` is a 1-column DataFrame
        of join-key values touched by this batch on either side."""
        epochs = self._epochs()
        if epoch_id in epochs:
            return
        meta = {"join_epochs": sorted(epochs | {int(epoch_id)})}
        touched = delta_keys.select(
            F.col(delta_keys.columns[0]).alias(self.join_key)
        ).distinct()
        if not self.view.exists():
            self.view.write(self.full_join(), metadata=meta)
            return
        recomputed = (
            self.left.read()
            .join(F.broadcast(touched), self.join_key, "left_semi")
            .join(
                self.right.read().join(F.broadcast(touched), self.join_key, "left_semi"),
                self.join_key,
            )
        )
        untouched = self.view.read().join(F.broadcast(touched), self.join_key, "left_anti")
        self.view.write(untouched.unionByName(recomputed), metadata=meta)
