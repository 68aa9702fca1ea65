"""Streaming semantic (SemDeDup-style) ingest: `readStream` of
embeddings → per-micro-batch cluster-pruned cosine screen → dedup-mode
ingest into the maintained semantic index
(operators/incremental_semantic.py).

The exactly-once contract (epoch guard atomic with the CAS flip,
overwrite-idempotent matches log, foreign-metadata preservation) and the
wiring live in MaintainedIngestPipelineBase (streaming/ingest_base.py) —
this module contributes the semantic-family unit: assign the batch under
the base version's quantizer, screen against the cluster-bucketed index
slice, append the accepted remainder with the index's own metadata keys
(seeds_version, n_rows, assign_mode) riding the same commit. The
semantic index's own commits (ingest append AND the density-triggered
requantize rebuild) preserve foreign metadata keys through the shared
base contract, so the guard survives mid-stream quantizer growth.

Maintenance (requantize + compaction via IndexMaintenancePolicy) runs
AFTER the commit, exactly as IncrementalSemanticDeduper.ingest does —
the base's ``_maintain`` is overridden to pass the requantizer.

100 TB shape unchanged from the batch operator: O(batch) assignment,
cluster-bucket-pruned screens, O(batch) hard-link appends; requantize is
the amortized O(log growth) rebuild the churn soaks measured
(SCALE_PROBE_r11_semchurn.json).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from tipoca_stream_spark.streaming.ingest_base import MaintainedIngestPipelineBase


@dataclass
class SemanticIngestConfig:
    root: str                  # index + seeds + matches live under here
    checkpoint_dir: str        # Spark streaming offsets
    id_col: str = "vec_id"
    # DDL type of id_col — used for the zero-committed-epochs matches()
    # schema, so it can never disagree with the parquet-logged matches
    id_type: str = "bigint"
    vec_col: str = "embedding"
    threshold: float = 0.999
    index_buckets: int = 32
    assign_mode: str = "flat"
    policy: object | None = None


class SemanticIngestPipeline(MaintainedIngestPipelineBase):
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
            policy=None,  # policy runs in _maintain AFTER the marked commit
        )

    # --- base hooks ----------------------------------------------------------

    def _op(self):
        return self.deduper

    def _empty_matches_schema(self) -> str:
        return (
            f"{self.config.id_col} {self.config.id_type}, cluster_id int, "
            "dup_of bigint, epoch int"
        )

    def _ingest_unit(
        self, vecs: DataFrame, base: int | None, epoch_id: int, guard: dict
    ) -> None:
        """IncrementalSemanticDeduper.ingest's unit with two insertions:
        the matches log before the commit, and the epoch guard riding the
        commit's metadata (which both the append and any later requantize
        preserve — the shared-base contract)."""
        cfg = self.config
        d = self.deduper
        flagged = d._screen(vecs, base)
        flagged.write.mode("overwrite").parquet(self._matches_dir(epoch_id))
        accepted = d._assigned(
            vecs, d.seeds_at(base), d._mode_at(base)
        ).join(flagged.select(cfg.id_col), cfg.id_col, "left_anti").persist()
        try:
            n_accepted = accepted.count()
            d.index.append_delta(
                accepted.select(cfg.id_col, "cluster_id", cfg.vec_col),
                metadata=d._merged_metadata(
                    base,
                    {
                        **guard,
                        "seeds_version": d._seeds_version_of(base),
                        "n_rows": (d._rows_at(base) if base is not None else 0)
                        + n_accepted,
                        "assign_mode": d._mode_at(base),
                    },
                ),
                expected_base=base,
            )
        finally:
            accepted.unpersist()

    def _maintain(self) -> None:
        if self.config.policy is not None:
            # AFTER the marked commit — requantize/compaction preserve
            # foreign metadata keys, so the guard survives maintenance
            self.config.policy.after_ingest(
                self.deduper.index, requantizer=self.deduper
            )
