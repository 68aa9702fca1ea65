"""Incremental semantic dedup: screen each NEW batch of embeddings
against the accepted corpus without rescanning it.

``operators/semantic_dedup.py`` is the one-shot corpus pass; a live
ingest pipeline needs the batch-vs-corpus form (the embedding twin of
``operators/incremental_dedup.py``'s MinHash signature index): persist
the accepted vectors WITH their cluster assignment, and screen each
batch only against the clusters it lands in:

    batch → assign_by_cosine (same seeds as the index — persisted with
            it, so assignments can never drift between epochs)
          → join index on cluster_id             -- candidate generation
          → cosine ≥ threshold                   -- verification
          → anti-join flagged ids                -- accepted remainder
          → index := index ∪ accepted            -- atomic version commit

Per-batch cost is O(batch × cluster density), never O(corpus): the
candidate join is keyed on cluster_id and the index side prunes to the
batch's clusters. The index commit rides ``ParquetTargetTable``'s
claim + CAS version flip — a crashed ingest leaves the previous index
intact, and two racing ingests resolve to exactly one winner (same T4
story as the CDC merge). Within-batch self-dedup composes separately
(``semantic_dedup`` on the accepted remainder) so the screen's contract
stays one-sided and oracle-checkable.

Reference contrast: tipoca-stream's dedup is PK latest-wins within a
batch (pkg/redshift/redshift.go:666-698); embedding-space screening is
a training-pipeline extension with no reference counterpart.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tipoca_stream_spark.operators.semantic_dedup import assign_by_cosine
from tipoca_stream_spark.operators.similarity import cosine
from tipoca_stream_spark.sources.target import ParquetTargetTable


class IncrementalSemanticDeduper:
    """``root`` holds the versioned index (id, cluster_id, embedding)
    plus the quantizer seeds. Pass ``seeds`` (seed_id, seed_vec) on
    first use; later instances load the persisted copy — the quantizer
    is part of the index's identity, so it is stored once and never
    silently swapped."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        seeds: DataFrame | None = None,
        threshold: float = 0.999,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        self.spark = spark
        self.threshold = threshold
        self.id_col = id_col
        self.vec_col = vec_col
        self.index = ParquetTargetTable(spark, root, "sem_index")
        self._seeds_dir = os.path.join(root, "sem_index_seeds")
        if seeds is not None and not os.path.isdir(self._seeds_dir):
            seeds.coalesce(1).write.mode("overwrite").parquet(self._seeds_dir)

    @property
    def seeds(self) -> DataFrame:
        return self.spark.read.parquet(self._seeds_dir)

    def _assigned(self, batch: DataFrame) -> DataFrame:
        assign = assign_by_cosine(
            batch, self.seeds, self.id_col, self.vec_col
        )
        return batch.select(self.id_col, self.vec_col).join(assign, self.id_col)

    def screen(self, batch: DataFrame) -> DataFrame:
        """Flagged batch rows ``(id, cluster_id, dup_of)``: near-dups of
        an ACCEPTED corpus member in the same cluster, with ``dup_of`` =
        the smallest such member. Empty index → nothing flagged."""
        return self._screen(batch, self.index.current_version())

    def _screen(self, batch: DataFrame, base: int | None) -> DataFrame:
        from tipoca_stream_spark.operators.semantic_dedup import salt_factor

        if base is None:
            return self._assigned(batch).select(
                self.id_col, "cluster_id", F.lit(None).cast("long").alias("dup_of")
            ).limit(0)
        # salted cluster join (see semantic_dedup): k clusters alone cap
        # the join at k parallel tasks through the compute-bound cosine
        # stage; the batch side takes one deterministic salt, the index
        # side replicates — each (batch, corpus) pair meets exactly once
        s = salt_factor(batch, self.seeds.count())
        p = batch.sparkSession.sparkContext.defaultParallelism
        # pinned-count repartition on the probe side: AQE coalesces the
        # small post-shuffle batch to one partition by byte size, blind
        # to the batch×cluster-density pair blowup the broadcast join
        # pipelines into it (see semantic_dedup — measured 1-task
        # 4-minute stages at sf1 before this)
        b = self._assigned(batch).select(
            F.col("cluster_id"),
            F.pmod(F.hash(F.col(self.id_col)), F.lit(s)).alias("_salt"),
            F.col(self.id_col).alias("_b_id"),
            F.col(self.vec_col).alias("_b_vec"),
        ).repartition(p, F.col("cluster_id"), F.col("_salt"))
        idx = self.index.read(base).select(
            F.col("cluster_id"),
            F.explode(F.sequence(F.lit(0), F.lit(s - 1))).alias("_salt"),
            F.col(self.id_col).alias("_c_id"),
            F.col(self.vec_col).alias("_c_vec"),
        )
        near = b.join(idx, ["cluster_id", "_salt"]).filter(
            F.round(cosine(F.col("_b_vec"), F.col("_c_vec")), 6)
            >= F.lit(self.threshold)
        )
        return near.groupBy(F.col("_b_id").alias(self.id_col), "cluster_id").agg(
            F.min("_c_id").alias("dup_of")
        )

    def ingest(self, batch: DataFrame) -> tuple[int, DataFrame]:
        """Screen, accept the remainder into the index (atomic version
        commit, CAS against the index version screened), return
        (n_accepted, flagged). The base version is captured ONCE and
        shared by the screen and the CAS — screening a newer index than
        the one the commit checks would let a racing ingest's rows count
        as 'already accepted' while its commit is overwritten. Retry on
        ConcurrentWriteError — the re-screen sees the winner's accepted
        rows, so a retried ingest can only flag MORE, never resurrect a
        duplicate."""
        base = self.index.current_version()
        flagged = self._screen(batch, base)
        accepted = self._assigned(batch).join(
            flagged.select(self.id_col), self.id_col, "left_anti"
        )
        prior = (
            self.index.read(base)
            if base is not None
            else accepted.limit(0)
        )
        new_index = prior.unionByName(
            accepted.select(self.id_col, "cluster_id", self.vec_col)
        )
        n_accepted = accepted.count()
        self.index.write(new_index, expected_base=base)
        return n_accepted, flagged
