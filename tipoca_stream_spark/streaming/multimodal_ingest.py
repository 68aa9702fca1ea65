"""Streaming multimodal ingest: `readStream` → per-micro-batch
fingerprinting → dedup-mode ingest into the maintained fingerprint index
(operators/incremental_fingerprint.py), with the CDC pipeline's
effectively-exactly-once contract (T4) carried over to the media plane:

- the EPOCH GUARD rides the index's version commit metadata — marking an
  epoch ingested is ATOMIC with the hard-link append's CAS version flip
  (the same shape as CdcPipeline's ``merged_epochs``,
  streaming/pipeline.py), so a crash leaves either "epoch fully in the
  index and marked" or "index untouched and unmarked", never half;
- the per-epoch MATCHES LOG (which incoming members duplicated what) is
  written to ``<root>/matches/epoch=<n>`` with mode=overwrite BEFORE the
  index commit: a replay of an uncommitted epoch recomputes the same
  matches against the same index version and overwrites idempotently; a
  replay of a committed epoch is skipped by the guard, leaving the log
  intact;
- within-batch duplicates are the fingerprint operator's group-rep
  concern (run `phash_group_reps` upstream if the source can repeat ids
  inside one file) — this pipeline answers "is it already in the
  corpus", exactly like the batch operator.

Reference contrast: the reference's loader runs its maintenance and its
exactly-once bookkeeping inside each batch cycle
(pkg/redshiftloader/load_processor.go:386-444); this is the same control
shape pointed at a media corpus instead of a warehouse table.

100 TB shape: each micro-batch pays O(batch) fingerprint work (Arrow
`mapInPandas` codec round-trips), an O(batch-distinct) band-bucket
screen against only the touched index files, and an O(batch) hard-link
append — corpus size never enters a per-batch term (probe:
SCALE_PROBE_r12_fpindex.json, 16x corpus → 0.96x screen latency).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class MultimodalIngestConfig:
    root: str                      # index + matches live under here
    checkpoint_dir: str            # Spark streaming offsets
    max_hamming: int = 8
    index_buckets: int = 32
    id_col: str = "media_id"
    hash_col: str = "phash"
    policy: object | None = None   # IndexMaintenancePolicy or None
    # fingerprint: DataFrame[(doc_id, text)] -> DataFrame[(media_id, hash)]
    # default = the repo's real-codec pHash
    fingerprinter: object | None = None
    extra: dict = field(default_factory=dict)


class MultimodalIngestPipeline:
    def __init__(self, spark: SparkSession, config: MultimodalIngestConfig):
        from tipoca_stream_spark.operators.incremental_fingerprint import (
            IncrementalFingerprintIndex,
        )

        self.spark = spark
        self.config = config
        self.index = IncrementalFingerprintIndex(
            spark,
            config.root,
            max_hamming=config.max_hamming,
            index_buckets=config.index_buckets,
            hash_col=config.hash_col,
            id_col=config.id_col,
            policy=config.policy,
        )

    # --- bookkeeping -------------------------------------------------------

    def _ingested_epochs(self) -> set[int]:
        return set(self.index.index.read_metadata().get("ingested_epochs", []))

    def _matches_dir(self, epoch_id: int) -> str:
        return os.path.join(self.config.root, "matches", f"epoch={epoch_id}")

    def matches(self) -> DataFrame:
        """The cumulative dedup log: (member_id, dup_of, hamming, epoch)
        across every committed epoch."""
        base = os.path.join(self.config.root, "matches")
        epochs = sorted(self._ingested_epochs())
        frames = []
        for e in epochs:
            d = self._matches_dir(e)
            if os.path.isdir(d):
                frames.append(
                    self.spark.read.parquet(d).withColumn("epoch", F.lit(e))
                )
        if not frames:
            return self.spark.createDataFrame(
                [], "member_id long, dup_of bigint, hamming int, epoch int"
            )
        out = frames[0]
        for f_ in frames[1:]:
            out = out.unionByName(f_)
        return out

    # --- the batch unit ----------------------------------------------------

    def fingerprint(self, docs: DataFrame) -> DataFrame:
        if self.config.fingerprinter is not None:
            return self.config.fingerprinter(docs)
        from tipoca_stream_spark.operators.phash import phash_from_documents

        return phash_from_documents(docs).select(
            F.col("media_id"), F.col("phash")
        )

    def ingest_batch(self, docs: DataFrame, epoch_id: int) -> None:
        """One micro-batch: fingerprint → screen+ingest (dedup mode) with
        the epoch marked atomically in the commit; matches logged
        idempotently per epoch BEFORE the commit (see module docstring
        for the crash/replay cases)."""
        done = self._ingested_epochs()
        if epoch_id in done:
            return
        ph = self.fingerprint(docs)
        # compute matches against the CURRENT version, log them, then
        # commit accepted rows with the epoch marker riding the flip
        base = self.index.index.current_version()
        matches = self.index._screen(ph, base)
        matches.write.mode("overwrite").parquet(self._matches_dir(epoch_id))
        flagged = matches.select(
            F.col("member_id").alias(self.config.id_col)
        ).distinct()
        accepted = ph.join(flagged, self.config.id_col, "left_anti")
        self.index.index.append_delta(
            self.index._band_rows(accepted),
            metadata={"ingested_epochs": sorted(done | {epoch_id})},
            expected_base=base,
        )
        if self.config.policy is not None:
            self.config.policy.after_ingest(self.index.index)

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
