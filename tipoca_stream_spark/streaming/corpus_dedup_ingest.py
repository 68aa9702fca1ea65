"""Streaming corpus dedup ingest: `readStream` of documents →
per-micro-batch MinHash signatures → dedup-mode ingest into the
maintained LSH band index (operators/incremental_dedup.py), with the
same effectively-exactly-once contract as the CDC pipeline (T4) and the
round-12 multimodal ingest (streaming/multimodal_ingest.py):

- the EPOCH GUARD rides the index version commit's metadata — atomic
  with the hard-link append's CAS flip;
- the per-epoch MATCHES LOG (new_id, corpus_id, est_jaccard) is written
  overwrite-idempotent to ``<root>/matches/epoch=<n>`` BEFORE the
  commit, so crash/replay converges to the clean-run state (an
  uncommitted epoch recomputes identical matches against the unchanged
  index version; a committed epoch is skipped outright);
- within-batch duplicates are the caller's concern (run
  exact_dedup_groups / lsh_candidate_pairs upstream) — this pipeline
  answers "is it already in the corpus", exactly like
  IncrementalDeduper.ingest.

This closes the T4 story across all three maintained indexes: MinHash
(here), fingerprint (multimodal_ingest), and semantic (batch-mode via
IncrementalSemanticDeduper — its quantizer requantize makes the
streaming wrapper a separate design decision).

100 TB shape: per micro-batch O(batch) shingle/minhash work, an
O(batch-bands) bucket-pruned candidate join against only the touched
index files, and an O(batch) hard-link append — corpus size never
enters a per-batch term (the IncrementalDeduper properties, unchanged).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class CorpusDedupIngestConfig:
    root: str                  # index + matches live under here
    checkpoint_dir: str        # Spark streaming offsets
    text_col: str = "text"
    id_col: str = "doc_id"
    n_hashes: int = 8
    band_size: int = 2
    threshold: float = 0.5
    index_buckets: int = 32
    policy: object | None = None


class CorpusDedupIngestPipeline:
    def __init__(self, spark: SparkSession, config: CorpusDedupIngestConfig):
        from tipoca_stream_spark.operators.incremental_dedup import (
            IncrementalDeduper,
        )

        self.spark = spark
        self.config = config
        self.deduper = IncrementalDeduper(
            spark,
            config.root,
            n_hashes=config.n_hashes,
            band_size=config.band_size,
            threshold=config.threshold,
            index_buckets=config.index_buckets,
            policy=config.policy,
        )

    # --- bookkeeping -------------------------------------------------------

    def _ingested_epochs(self) -> set[int]:
        return set(
            self.deduper.index.read_metadata().get("ingested_epochs", [])
        )

    def _matches_dir(self, epoch_id: int) -> str:
        return os.path.join(self.config.root, "matches", f"epoch={epoch_id}")

    def matches(self) -> DataFrame:
        """Cumulative dedup log: (new_id, corpus_id, est_jaccard, epoch)
        across every committed epoch."""
        frames = []
        for e in sorted(self._ingested_epochs()):
            d = self._matches_dir(e)
            if os.path.isdir(d):
                frames.append(
                    self.spark.read.parquet(d).withColumn("epoch", F.lit(e))
                )
        if not frames:
            return self.spark.createDataFrame(
                [], "new_id string, corpus_id string, est_jaccard double, epoch int"
            )
        out = frames[0]
        for f_ in frames[1:]:
            out = out.unionByName(f_)
        return out

    # --- the batch unit ----------------------------------------------------

    def ingest_batch(self, docs: DataFrame, epoch_id: int) -> None:
        """One micro-batch: signatures → band-bucket screen against the
        CURRENT index version → log matches (idempotent overwrite) →
        commit accepted band rows with the epoch marker riding the CAS
        version flip."""
        done = self._ingested_epochs()
        if epoch_id in done:
            return
        cfg = self.config
        d = self.deduper
        sig = d._signatures(docs, cfg.text_col, cfg.id_col)
        base = d.index.current_version()
        if base is not None:
            matches = d._matches(sig, cfg.id_col, base)
        else:
            id_type = docs.schema[cfg.id_col].dataType.simpleString()
            matches = self.spark.createDataFrame(
                [], f"new_id {id_type}, corpus_id {id_type}, est_jaccard double"
            )
        matches.write.mode("overwrite").parquet(self._matches_dir(epoch_id))
        flagged = matches.select(
            F.col("new_id").alias(cfg.id_col)
        ).distinct()
        accepted_sigs = sig.join(flagged, cfg.id_col, "left_anti")
        d.index.append_delta(
            d._band_rows(accepted_sigs, cfg.id_col),
            metadata={"ingested_epochs": sorted(done | {epoch_id})},
            expected_base=base,
        )
        if cfg.policy is not None:
            cfg.policy.after_ingest(d.index)

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

    def run_batch(self, docs: DataFrame, epoch_id: int = 0) -> None:
        """Batch-mode execution of the same unit (backfills)."""
        self.ingest_batch(docs, epoch_id)
