"""Streaming corpus dedup ingest: `readStream` of documents →
per-micro-batch MinHash signatures → dedup-mode ingest into the
maintained LSH band index (operators/incremental_dedup.py).

The exactly-once contract (epoch guard atomic with the CAS flip,
overwrite-idempotent matches log, foreign-metadata preservation) and the
wiring live in MaintainedIngestPipelineBase (streaming/ingest_base.py) —
this module contributes only the MinHash-family unit: shingle → minhash
the batch, screen against the band-bucketed index slice, append the
accepted signatures' band rows.

100 TB shape: per micro-batch O(batch) shingle/minhash work, an
O(batch-bands) bucket-pruned candidate join against only the touched
index files, and an O(batch) hard-link append — corpus size never
enters a per-batch term (the IncrementalDeduper properties, unchanged).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tipoca_stream_spark.streaming.ingest_base import MaintainedIngestPipelineBase


@dataclass
class CorpusDedupIngestConfig:
    root: str                  # index + matches live under here
    checkpoint_dir: str        # Spark streaming offsets
    text_col: str = "text"
    id_col: str = "doc_id"
    # DDL type of id_col — used for the zero-committed-epochs matches()
    # schema, so it can never disagree with the parquet-logged matches
    # (ADVICE r12 #1: this was hardcoded to string)
    id_type: str = "string"
    n_hashes: int = 8
    band_size: int = 2
    threshold: float = 0.5
    index_buckets: int = 32
    policy: object | None = None


class CorpusDedupIngestPipeline(MaintainedIngestPipelineBase):
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

    # --- base hooks ----------------------------------------------------------

    def _op(self):
        return self.deduper

    def _empty_matches_schema(self) -> str:
        t = self.config.id_type
        return f"new_id {t}, corpus_id {t}, est_jaccard double, epoch int"

    def _ingest_unit(
        self, docs: DataFrame, base: int | None, epoch_id: int, guard: dict
    ) -> None:
        """Signatures → band-bucket screen against version ``base`` →
        log matches (idempotent overwrite) → commit accepted band rows
        with the epoch guard riding the CAS flip, merged over foreign
        metadata."""
        cfg = self.config
        d = self.deduper
        sig = d._signatures(docs, cfg.text_col, cfg.id_col)
        if base is not None:
            matches = d._matches(sig, cfg.id_col, base)
        else:
            id_type = docs.schema[cfg.id_col].dataType.simpleString()
            matches = self.spark.createDataFrame(
                [], f"new_id {id_type}, corpus_id {id_type}, est_jaccard double"
            )
        matches.write.mode("overwrite").parquet(self._matches_dir(epoch_id))
        flagged = matches.select(F.col("new_id").alias(cfg.id_col)).distinct()
        accepted_sigs = sig.join(flagged, cfg.id_col, "left_anti")
        d.index.append_delta(
            d._band_rows(accepted_sigs, cfg.id_col),
            metadata=d._merged_metadata(base, guard),
            expected_base=base,
        )
