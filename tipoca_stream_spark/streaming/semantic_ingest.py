"""Streaming semantic (SemDeDup-style) ingest: `readStream` of
embeddings → per-micro-batch cluster-pruned cosine screen → dedup-mode
ingest into the maintained semantic index
(operators/incremental_semantic.py), with the same
effectively-exactly-once contract as the CDC, multimodal, and
corpus-dedup pipelines:

- the EPOCH GUARD rides the index commit's metadata, atomic with the CAS
  version flip; the semantic index's own commits (ingest append AND the
  density-triggered requantize rebuild) preserve foreign metadata keys,
  so the guard survives mid-stream quantizer growth;
- the per-epoch MATCHES LOG (id, cluster_id, dup_of) is written
  overwrite-idempotent BEFORE the commit (crash/replay converges — the
  replay recomputes identical matches against the unchanged base
  version);
- maintenance (requantize + compaction via IndexMaintenancePolicy) runs
  AFTER the commit, exactly as IncrementalSemanticDeduper.ingest does.

This completes the T4 streaming story across all three maintained
indexes: MinHash (streaming/corpus_dedup_ingest.py), fingerprint
(streaming/multimodal_ingest.py), and semantic (here).

100 TB shape unchanged from the batch operator: O(batch) assignment,
cluster-bucket-pruned screens, O(batch) hard-link appends; requantize is
the amortized O(log growth) rebuild the churn soaks measured
(SCALE_PROBE_r11_semchurn.json).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class SemanticIngestConfig:
    root: str                  # index + seeds + matches live under here
    checkpoint_dir: str        # Spark streaming offsets
    id_col: str = "vec_id"
    vec_col: str = "embedding"
    threshold: float = 0.999
    index_buckets: int = 32
    assign_mode: str = "flat"
    policy: object | None = None


class SemanticIngestPipeline:
    def __init__(
        self,
        spark: SparkSession,
        config: SemanticIngestConfig,
        seeds: DataFrame | None = None,
    ):
        """``seeds`` (seed_id, seed_vec) is required on FIRST use of a
        root, exactly like IncrementalSemanticDeduper."""
        from tipoca_stream_spark.operators.incremental_semantic import (
            IncrementalSemanticDeduper,
        )

        self.spark = spark
        self.config = config
        self.deduper = IncrementalSemanticDeduper(
            spark,
            config.root,
            seeds=seeds,
            id_col=config.id_col,
            vec_col=config.vec_col,
            threshold=config.threshold,
            index_buckets=config.index_buckets,
            assign_mode=config.assign_mode,
            policy=None,  # policy runs in ingest_batch AFTER the marked commit
        )
        self._policy = config.policy

    # --- bookkeeping -------------------------------------------------------

    def _ingested_epochs(self) -> set[int]:
        return set(
            self.deduper.index.read_metadata().get("ingested_epochs", [])
        )

    def _matches_dir(self, epoch_id: int) -> str:
        return os.path.join(self.config.root, "matches", f"epoch={epoch_id}")

    def matches(self) -> DataFrame:
        """Cumulative dedup log: (id, cluster_id, dup_of, epoch) across
        every committed epoch."""
        frames = []
        for e in sorted(self._ingested_epochs()):
            d = self._matches_dir(e)
            if os.path.isdir(d):
                frames.append(
                    self.spark.read.parquet(d).withColumn("epoch", F.lit(e))
                )
        if not frames:
            return self.spark.createDataFrame(
                [],
                f"{self.config.id_col} long, cluster_id int, dup_of bigint, epoch int",
            )
        out = frames[0]
        for f_ in frames[1:]:
            out = out.unionByName(f_)
        return out

    # --- the batch unit ----------------------------------------------------

    def ingest_batch(self, vecs: DataFrame, epoch_id: int) -> None:
        """One micro-batch = IncrementalSemanticDeduper.ingest's unit with
        two insertions: the matches log before the commit, and the epoch
        marker riding the commit's metadata (which both the append and
        any later requantize preserve)."""
        done = self._ingested_epochs()
        if epoch_id in done:
            return
        cfg = self.config
        d = self.deduper
        base = d.index.current_version()
        flagged = d._screen(vecs, base)
        flagged.write.mode("overwrite").parquet(self._matches_dir(epoch_id))
        accepted = d._assigned(
            vecs, d.seeds_at(base), d._mode_at(base)
        ).join(flagged.select(cfg.id_col), cfg.id_col, "left_anti").persist()
        try:
            n_accepted = accepted.count()
            sv = d._seeds_version_of(base)
            n_prev = d._rows_at(base) if base is not None else 0
            d.index.append_delta(
                accepted.select(cfg.id_col, "cluster_id", cfg.vec_col),
                metadata={
                    **(d._meta_at(base) if base is not None else {}),
                    "seeds_version": sv,
                    "n_rows": n_prev + n_accepted,
                    "assign_mode": d._mode_at(base),
                    "ingested_epochs": sorted(done | {epoch_id}),
                },
                expected_base=base,
            )
        finally:
            accepted.unpersist()
        if self._policy is not None:
            # AFTER the marked commit — requantize/compaction preserve
            # foreign metadata keys, so the guard survives maintenance
            self._policy.after_ingest(d.index, requantizer=d)

    # --- wiring ------------------------------------------------------------

    def start(self, raw_stream: DataFrame, trigger_available_now: bool = True):
        def process(bdf: DataFrame, eid: int) -> None:
            self.ingest_batch(bdf, eid)

        writer = (
            raw_stream.writeStream.outputMode("append")
            .option(
                "checkpointLocation",
                os.path.join(self.config.checkpoint_dir, "spark"),
            )
            .foreachBatch(process)
        )
        if trigger_available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def run_batch(self, vecs: DataFrame, epoch_id: int = 0) -> None:
        """Batch-mode execution of the same unit (backfills)."""
        self.ingest_batch(vecs, epoch_id)
