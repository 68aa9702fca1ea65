"""Streaming corpus dedup ingest (round 12): file-source stream of
documents → MinHash → dedup ingest into the maintained LSH band index.
Same T4 contract as the multimodal ingest: streaming ≡ batch acceptance
chain, epoch guard atomic with the index version flip, crash between
matches log and commit idempotent."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tipoca_stream_spark.operators.incremental_dedup import IncrementalDeduper
from tipoca_stream_spark.streaming.corpus_dedup_ingest import (
    CorpusDedupIngestConfig,
    CorpusDedupIngestPipeline,
)

RAW_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.StringType()), T.StructField("text", T.StringType())]
)

EPOCHS = [
    [("a1", "the quick brown fox jumps over the lazy dog near the river bank"),
     ("a2", "machine learning models need large clean training corpora to work"),
     ("a3", "completely unrelated text about cooking pasta with fresh tomatoes")],
    [("b1", "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of a1
     ("b2", "machine learning models need large clean training datasets to work"),  # near dup of a2
     ("b3", "astronomy surveys scan the sky for transient events every night")],   # novel
    [("c1", "astronomy surveys scan the sky for transient events every night"),    # dup of b3 (epoch-1 accept)
     ("c2", "orbital mechanics textbooks derive transfer windows from energy budgets")],
]

_MTIME = [1_700_100_000]


def _write_epoch(path, rows):
    with open(path, "w") as f:
        for did, text in rows:
            f.write(json.dumps({"doc_id": did, "text": text}) + "\n")
    _MTIME[0] += 60
    os.utime(path, (_MTIME[0], _MTIME[0]))


@pytest.fixture()
def pipe(spark, tmp_path):
    cfg = CorpusDedupIngestConfig(
        root=str(tmp_path / "lshindex"), checkpoint_dir=str(tmp_path / "ckpt")
    )
    return CorpusDedupIngestPipeline(spark, cfg)


def _run_stream(spark, pipe, input_dir):
    raw = (
        spark.readStream.schema(RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(input_dir))
    )
    q = pipe.start(raw)
    q.awaitTermination(120)


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _chain_replay(spark, tmp_path, epochs):
    """Oracle: a fresh IncrementalDeduper ingesting the same epochs in
    batch mode — the streaming pipeline must be indistinguishable."""
    d = IncrementalDeduper(spark, str(tmp_path / "oracle_idx"))
    matches = []
    for e, rows in enumerate(epochs):
        _, pairs = d.ingest(_df(spark, rows))
        matches.extend(
            (r["new_id"], r["corpus_id"], round(r["est_jaccard"], 6), e)
            for r in pairs.collect()
        )
    return d, sorted(matches)


def test_stream_equals_batch_deduper(spark, tmp_path, pipe):
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    for e, rows in enumerate(EPOCHS):
        _write_epoch(input_dir / f"epoch{e}.json", rows)
    _run_stream(spark, pipe, input_dir)

    oracle, want_matches = _chain_replay(spark, tmp_path, EPOCHS)
    got_matches = sorted(
        (r["new_id"], r["corpus_id"], round(r["est_jaccard"], 6), r["epoch"])
        for r in pipe.matches().collect()
    )
    assert got_matches == want_matches
    hits = {(m[0], m[1]) for m in got_matches}
    assert ("b1", "a1") in hits and ("b2", "a2") in hits
    assert ("c1", "b3") in hits  # chains through an epoch-1 accept
    # index contents equal the batch deduper's (same accepted signatures)
    got_ids = sorted(r["doc_id"] for r in pipe.deduper.signatures().collect())
    want_ids = sorted(r["doc_id"] for r in oracle.signatures().collect())
    assert got_ids == want_ids
    assert pipe._ingested_epochs() == {0, 1, 2}


def test_restart_and_crash_idempotence(spark, tmp_path, pipe):
    pipe.run_batch(_df(spark, EPOCHS[0]), epoch_id=0)
    v0 = pipe.deduper.index.current_version()
    # replayed epoch: no movement
    pipe.run_batch(_df(spark, EPOCHS[0]), epoch_id=0)
    assert pipe.deduper.index.current_version() == v0

    # crash AFTER the matches log, BEFORE the commit
    real_append = pipe.deduper.index.append_delta

    def boom(*a, **k):
        raise RuntimeError("crash before commit")

    pipe.deduper.index.append_delta = boom
    with pytest.raises(RuntimeError):
        pipe.run_batch(_df(spark, EPOCHS[1]), epoch_id=1)
    pipe.deduper.index.append_delta = real_append
    assert pipe._ingested_epochs() == {0}
    assert pipe.deduper.index.current_version() == v0

    # replay completes; state == clean run
    pipe.run_batch(_df(spark, EPOCHS[1]), epoch_id=1)
    assert pipe._ingested_epochs() == {0, 1}
    ids = sorted(r["doc_id"] for r in pipe.deduper.signatures().collect())
    assert ids == ["a1", "a2", "a3", "b3"]
    hits = {(r["new_id"], r["corpus_id"]) for r in pipe.matches().collect()}
    assert ("b1", "a1") in hits and ("b2", "a2") in hits
