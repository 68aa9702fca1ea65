"""Incremental near-dup dedup: screen each NEW batch of documents against
the already-accepted corpus WITHOUT rescanning corpus text.

At 100 TB the corpus is ingested continuously; re-running full-corpus LSH
per batch is O(corpus) per batch. The standard fix (this module) is to persist
a compact MinHash **signature index** of accepted docs and screen each
batch against it:

    batch → shingle → minhash (operators/corpus_dedup.py, unchanged)
          → band keys ⋈ index band keys        -- candidate generation
          → signature agreement ≥ threshold    -- verification
          → anti-join flagged ids              -- accepted remainder
          → index := index ∪ accepted sigs     -- atomic version commit

Only signatures (id + n_hashes digests ≈ 100 bytes/doc — ~3 orders of
magnitude smaller than text) are ever stored or joined; corpus text is
never re-read. Verification uses the MinHash estimator itself (fraction
of agreeing signature positions estimates Jaccard), the textbook
index-side trade: no false-negative-free guarantee, but tunable via
n_hashes/threshold, and no O(corpus) text fetch.

Scale notes: the candidate join is keyed on (band_no, band_key); the
batch side is O(batch × bands) rows. Locally the index side re-derives
band keys per ingest (a narrow md5 projection over the signature scan);
at warehouse scale store the band table as a ``bucketBy(band_key)``
table (sources/bucketed.py) so the index side joins exchange-free and
the scan prunes to the batch's buckets. The index commit rides
``ParquetTargetTable``'s atomic version flip — a crashed ingest leaves
the previous index intact (same T4 story as the CDC merge).

Reference contrast: tipoca-stream's dedup is PK latest-wins within a
batch (pkg/redshift/redshift.go:666-698); content-based cross-corpus
dedup is a training-pipeline extension with no reference counterpart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tipoca_stream_spark.operators.corpus_dedup import (
    lsh_band_keys,
    minhash_signatures,
    word_shingles,
)
from tipoca_stream_spark.sources.target import ParquetTargetTable


class IncrementalDeduper:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n_hashes: int = 8,
        band_size: int = 2,
        threshold: float = 0.5,
    ):
        self.spark = spark
        self.n_hashes = n_hashes
        self.band_size = band_size
        self.threshold = threshold
        self.index = ParquetTargetTable(spark, root, "lsh_sig_index")

    def _signatures(self, docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
        sh = word_shingles(docs, text_col, id_col)
        return minhash_signatures(sh, id_col, self.n_hashes)

    def matches(self, sig_new: DataFrame, id_col: str) -> DataFrame:
        """(new_id, corpus_id, est_jaccard ≥ threshold) — candidates from
        shared band buckets, verified by signature agreement."""
        sig_idx = self.index.read()
        bands_new = lsh_band_keys(sig_new, id_col, self.band_size).withColumnRenamed(
            id_col, "new_id"
        )
        bands_idx = lsh_band_keys(sig_idx, id_col, self.band_size).withColumnRenamed(
            id_col, "corpus_id"
        )
        cand = (
            bands_new.join(bands_idx, ["band_no", "band_key"])
            .select("new_id", "corpus_id")
            .distinct()
        )
        sig_cols = [c for c in sig_new.columns if c != id_col]
        n = sig_new.withColumnRenamed(id_col, "new_id")
        for c in sig_cols:
            n = n.withColumnRenamed(c, f"{c}_n")
        i = sig_idx.withColumnRenamed(id_col, "corpus_id")
        agree = sum(
            F.when(F.col(f"{c}_n") == F.col(c), 1).otherwise(0) for c in sig_cols
        )
        est = (agree / F.lit(len(sig_cols))).alias("est_jaccard")
        return (
            cand.join(n, "new_id")
            .join(i, "corpus_id")
            .select("new_id", "corpus_id", est)
            .filter(F.col("est_jaccard") >= self.threshold)
        )

    def ingest(
        self, docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
    ) -> tuple[DataFrame, DataFrame]:
        """Screen ``docs`` against the index; return (accepted_docs,
        match_pairs) and commit accepted signatures as the next index
        version. Within-batch duplicates are the caller's concern (run
        exact_dedup_groups / lsh_candidate_pairs first) — this operator
        answers only "is it already in the corpus"."""
        sig_new = self._signatures(docs, text_col, id_col).persist()
        # CAS base: the index version this screen read — two pipelines
        # ingesting concurrently would otherwise silently drop one side's
        # accepted signatures (the classic lost-update); with the guard the
        # loser raises ConcurrentWriteError and retries against the new
        # index (same protocol as the CDC target, sources/target.py)
        base = self.index.current_version()
        try:
            if self.index.exists():
                pairs = self.matches(sig_new, id_col).persist()
                flagged = pairs.select(F.col("new_id").alias(id_col)).distinct()
                accepted = docs.join(flagged, id_col, "left_anti")
                accepted_sigs = sig_new.join(flagged, id_col, "left_anti")
                new_index = self.index.read().unionByName(accepted_sigs)
            else:
                id_type = docs.schema[id_col].dataType.simpleString()
                pairs = self.spark.createDataFrame(
                    [], f"new_id {id_type}, corpus_id {id_type}, est_jaccard double"
                )
                accepted, new_index = docs, sig_new
            self.index.write(new_index, expected_base=base)
        except BaseException:
            # pairs is returned to the caller on success; on a failed
            # commit nobody will ever unpersist it but us
            if "pairs" in locals():
                pairs.unpersist()
            raise
        finally:
            # the advertised retry path (ConcurrentWriteError) must not
            # strand a persisted signature frame per attempt
            sig_new.unpersist()
        return accepted, pairs
