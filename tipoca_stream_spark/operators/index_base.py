"""Shared core of the three CAS-maintained incremental indexes
(round 13, VERDICT r12 next #4): MinHash band
(operators/incremental_dedup.py), semantic cluster
(operators/incremental_semantic.py), and multimodal fingerprint band
(operators/incremental_fingerprint.py). All three converged on the same
contract over a ``BucketedTargetTable``:

- **bucket-pruned screens**: the batch's probe keys (band_key /
  cluster_id) hash to a bounded set of index buckets; only those
  buckets' FILES are scheduled (``read_buckets``), and
  ``last_screen_stats`` records scanned-vs-total so tests and probes can
  pin the pruning. ≤ index_buckets integers ever reach the driver —
  never rows.
- **O(batch) CAS ingest**: accepted rows land via ``append_delta``
  against the version the screen read (``expected_base``); a racing
  commit loses with ``ConcurrentWriteError`` instead of silently
  dropping rows (the CDC T4 story, sources/target.py).
- **foreign-metadata preservation** (the round-12 semantic fix,
  promoted here to the contract of ALL maintained indexes and tested
  once in tests/test_index_base.py): every commit built through
  ``_merged_metadata`` carries UNKNOWN keys of the base version forward
  and overwrites only the index's own keys — so a streaming wrapper's
  epoch guard survives ingest, compaction, requantize, or any other
  index-owned commit.
- **maintenance inside the ingest cycle**: ``_after_ingest`` consults
  the IndexMaintenancePolicy AFTER the commit (the batch is durable
  whatever maintenance does), mirroring the reference loader's
  maintenance-inside-the-batch-cycle stance
  (pkg/redshiftloader/load_processor.go:386-444).

The subclasses keep their own probe construction and verification —
that is genuinely different per family (signature agreement vs cosine
vs Hamming) — while the screen-slice, metadata, and policy plumbing
live here exactly once.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from tipoca_stream_spark.sources.target import BucketedTargetTable


class MaintainedIndexBase:
    """Base for an incrementally-maintained, CAS-versioned, bucketed
    index. ``index`` is the BucketedTargetTable holding the rows;
    ``policy`` (operators/index_maintenance.py) runs after each ingest
    commit when set."""

    def __init__(
        self, spark: SparkSession, index: BucketedTargetTable, policy=None
    ):
        self.spark = spark
        self.index = index
        self.policy = policy
        # (files_scanned, files_total) of the last screen's index read —
        # the file-pruning evidence: scanned ∝ batch's touched buckets
        self.last_screen_stats: dict = {}

    # --- bucket-pruned reads ------------------------------------------------

    def _read_touched(self, probe: DataFrame, base: int | None) -> DataFrame:
        """The index slice a screen may collide with: collect the probe
        frame's DISTINCT bucket ids (bounded by index_buckets — ids only,
        never rows) and schedule only those buckets' files of version
        ``base``; record scanned-vs-total in ``last_screen_stats``."""
        touched = [
            r["_b"]
            for r in probe.select(
                self.index.bucket_of().alias("_b")
            ).distinct().collect()
        ]
        sl = self.index.read_buckets(touched, version=base)
        self.last_screen_stats = dict(self.index.last_bucket_read_stats)
        return sl

    # --- commit metadata ------------------------------------------------------

    def _meta_at(self, base: int) -> dict:
        """Commit metadata of index version ``base`` (not the live
        pointer — a concurrent commit landing mid-read must not mix
        versions)."""
        try:
            with open(os.path.join(self.index._vdir(base), "_meta.json")) as f:
                return json.load(f)
        except (FileNotFoundError, ValueError):
            return {}

    def _merged_metadata(self, base: int | None, own: dict | None = None) -> dict:
        """Foreign-key-preserving commit metadata: unknown keys of the
        base version carry forward verbatim; ``own`` (the index's or a
        wrapper's keys, e.g. a streaming epoch guard) overwrites. Every
        maintained-index commit that passes explicit metadata must build
        it here — passing a raw dict to ``append_delta`` erases foreign
        keys wholesale (ADVICE r12 #2)."""
        return {**(self._meta_at(base) if base is not None else {}), **(own or {})}

    # --- maintenance hook -----------------------------------------------------

    def _after_ingest(self, **kw) -> None:
        """Consult the maintenance policy AFTER a durable commit; a
        maintenance CAS loss is recorded by the policy and re-evaluated
        on the next batch, never blocks this one."""
        if self.policy is not None:
            self.policy.after_ingest(self.index, **kw)
