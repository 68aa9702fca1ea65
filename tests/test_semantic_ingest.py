"""Streaming semantic ingest (round 12): per-micro-batch cluster-pruned
cosine screens into the maintained semantic index. Contract: streaming ≡
batch IncrementalSemanticDeduper, epoch guard atomic with the CAS flip,
crash idempotent, and — the semantic-specific hazard — the guard must
survive a mid-stream density-triggered REQUANTIZE (a full index rewrite
with fresh metadata)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tipoca_stream_spark.operators.incremental_semantic import (
    IncrementalSemanticDeduper,
)
from tipoca_stream_spark.streaming.semantic_ingest import (
    SemanticIngestConfig,
    SemanticIngestPipeline,
)

SEEDS = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])]
EPOCHS = [
    [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0]), (2, [0.9, 0.1, 0.0, 0.0])],
    [(10, [1.0, 0.0, 0.0, 0.0]),          # exact dup of 0
     (11, [0.0, 1.0, 0.0, 0.0]),          # exact dup of 1
     (12, [0.1, 0.0, 1.0, 0.0])],         # novel
    [(20, [0.1, 0.0, 1.0, 0.0]),          # dup of the epoch-1 accept (12)
     (21, [0.0, 0.1, 0.0, 1.0])],         # novel
]


def _seeds_df(spark):
    return spark.createDataFrame(SEEDS, ["seed_id", "seed_vec"]).select(
        F.col("seed_id").cast("int").alias("seed_id"),
        F.col("seed_vec").cast("array<float>").alias("seed_vec"),
    )


def _df(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("embedding").cast("array<float>").alias("embedding"),
    )


def _pipe(spark, tmp_path, policy=None):
    cfg = SemanticIngestConfig(
        root=str(tmp_path / "semindex"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        policy=policy,
    )
    return SemanticIngestPipeline(spark, cfg, seeds=_seeds_df(spark))


def test_batch_unit_equals_batch_deduper(spark, tmp_path):
    pipe = _pipe(spark, tmp_path)
    for e, rows in enumerate(EPOCHS):
        pipe.run_batch(_df(spark, rows), epoch_id=e)
    oracle = IncrementalSemanticDeduper(
        spark, str(tmp_path / "oracle"), seeds=_seeds_df(spark), threshold=0.999
    )
    want = []
    for e, rows in enumerate(EPOCHS):
        _, flagged = oracle.ingest(_df(spark, rows))
        want.extend((r["vec_id"], r["dup_of"], e) for r in flagged.collect())
    got = sorted((r["vec_id"], r["dup_of"], r["epoch"]) for r in pipe.matches().collect())
    assert got == sorted(want)
    assert (10, 0, 1) in got and (11, 1, 1) in got and (20, 12, 2) in got
    got_ids = sorted(
        r["vec_id"] for r in pipe.deduper.index.read().collect()
    )
    want_ids = sorted(r["vec_id"] for r in oracle.index.read().collect())
    assert got_ids == want_ids == [0, 1, 2, 12, 21]
    assert pipe._ingested_epochs() == {0, 1, 2}


def test_crash_between_log_and_commit_is_idempotent(spark, tmp_path):
    pipe = _pipe(spark, tmp_path)
    pipe.run_batch(_df(spark, EPOCHS[0]), epoch_id=0)
    v0 = pipe.deduper.index.current_version()
    real_append = pipe.deduper.index.append_delta

    def boom(*a, **k):
        raise RuntimeError("crash before commit")

    pipe.deduper.index.append_delta = boom
    with pytest.raises(RuntimeError):
        pipe.run_batch(_df(spark, EPOCHS[1]), epoch_id=1)
    pipe.deduper.index.append_delta = real_append
    assert pipe._ingested_epochs() == {0}
    assert pipe.deduper.index.current_version() == v0
    pipe.run_batch(_df(spark, EPOCHS[1]), epoch_id=1)
    assert pipe._ingested_epochs() == {0, 1}
    got = {(r["vec_id"], r["dup_of"]) for r in pipe.matches().collect()}
    assert (10, 0) in got and (11, 1) in got


def test_epoch_guard_survives_requantize(spark, tmp_path):
    from tipoca_stream_spark.operators.index_maintenance import (
        IndexMaintenancePolicy,
    )

    pol = IndexMaintenancePolicy(
        target_per_cluster=1, compact_files_per_bucket=None, vacuum_keep=None
    )
    pipe = _pipe(spark, tmp_path, policy=pol)
    for e, rows in enumerate(EPOCHS):
        pipe.run_batch(_df(spark, rows), epoch_id=e)
    assert any(h.get("requantized") for h in pol.history), pol.history
    # the requantize rewrote the index with fresh metadata — the guard
    # must have carried through (foreign-key preservation in the commit)
    assert pipe._ingested_epochs() == {0, 1, 2}
    v = pipe.deduper.index.current_version()
    for e, rows in enumerate(EPOCHS):   # full replay: all skipped
        pipe.run_batch(_df(spark, rows), epoch_id=e)
    assert pipe.deduper.index.current_version() == v
