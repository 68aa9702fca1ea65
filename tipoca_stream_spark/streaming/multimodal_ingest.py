"""Streaming multimodal ingest: `readStream` → per-micro-batch
fingerprinting → dedup-mode ingest into the maintained fingerprint index
(operators/incremental_fingerprint.py).

The exactly-once contract (epoch guard atomic with the CAS flip,
overwrite-idempotent matches log, foreign-metadata preservation) and the
wiring live in MaintainedIngestPipelineBase (streaming/ingest_base.py) —
this module contributes only the fingerprint-family unit: fingerprint
the batch (Arrow ``mapInPandas`` codec round-trips by default), screen
against the band-bucketed index slice, append the accepted remainder.

100 TB shape: each micro-batch pays O(batch) fingerprint work, an
O(batch-distinct) band-bucket screen against only the touched index
files, and an O(batch) hard-link append — corpus size never enters a
per-batch term (probe: SCALE_PROBE_r12_fpindex.json, 16x corpus → 0.96x
screen latency).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tipoca_stream_spark.streaming.ingest_base import MaintainedIngestPipelineBase


@dataclass
class MultimodalIngestConfig:
    root: str                      # index + matches live under here
    checkpoint_dir: str            # Spark streaming offsets
    max_hamming: int = 8
    index_buckets: int = 32
    id_col: str = "media_id"
    # DDL type of id_col — used for the zero-committed-epochs matches()
    # schema, so it can never disagree with the parquet-logged matches
    # (ADVICE r12 #1: this was hardcoded to long)
    id_type: str = "bigint"
    hash_col: str = "phash"
    policy: object | None = None   # IndexMaintenancePolicy or None
    # fingerprint: DataFrame[(doc_id, text)] -> DataFrame[(media_id, hash)]
    # default = the repo's real-codec pHash
    fingerprinter: object | None = None
    extra: dict = field(default_factory=dict)


class MultimodalIngestPipeline(MaintainedIngestPipelineBase):
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

    # --- base hooks ----------------------------------------------------------

    def _op(self):
        return self.index

    def _empty_matches_schema(self) -> str:
        return (
            f"member_id {self.config.id_type}, dup_of bigint, "
            "hamming int, epoch int"
        )

    def fingerprint(self, docs: DataFrame) -> DataFrame:
        if self.config.fingerprinter is not None:
            return self.config.fingerprinter(docs)
        from tipoca_stream_spark.operators.phash import phash_from_documents

        return phash_from_documents(docs).select(
            F.col("media_id"), F.col("phash")
        )

    def _ingest_unit(
        self, docs: DataFrame, base: int | None, epoch_id: int, guard: dict
    ) -> None:
        """Fingerprint → screen against version ``base`` → log matches
        (idempotent overwrite) → commit accepted band rows with the epoch
        guard riding the CAS flip, merged over foreign metadata."""
        ph = self.fingerprint(docs)
        matches = self.index._screen(ph, base)
        matches.write.mode("overwrite").parquet(self._matches_dir(epoch_id))
        flagged = matches.select(
            F.col("member_id").alias(self.config.id_col)
        ).distinct()
        accepted = ph.join(flagged, self.config.id_col, "left_anti")
        self.index.index.append_delta(
            self.index._band_rows(accepted),
            metadata=self.index._merged_metadata(base, guard),
            expected_base=base,
        )
