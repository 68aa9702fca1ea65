"""Streaming multimodal ingest (round 12): file-source stream →
per-micro-batch fingerprint → dedup ingest into the maintained
fingerprint index. Contract under test = the CDC pipeline's T4 story on
the media plane: streaming ≡ batch acceptance chain, epoch guard atomic
with the index version flip (replays skipped), crash-between-log-and-
commit idempotent, and the real-codec fingerprinter wired by default."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tipoca_stream_spark.operators.phash import phash_screen
from tipoca_stream_spark.streaming.multimodal_ingest import (
    MultimodalIngestConfig,
    MultimodalIngestPipeline,
)

RAW_SCHEMA = T.StructType(
    [T.StructField("media_id", T.LongType()), T.StructField("fp", T.StringType())]
)


def _fp(bits_on):
    return "".join("1" if i in bits_on else "0" for i in range(64))


# epoch 0: three well-separated originals; epoch 1: one exact dup, one
# near dup (hamming 1), one novel; epoch 2: dup of the epoch-1 NOVEL doc
# (tests that acceptance chains through prior epochs, not just epoch 0)
EPOCHS = [
    [(0, _fp([0, 1, 2, 3])), (1, _fp([20, 25, 30, 35, 40])), (2, _fp([60, 61, 62, 63, 50, 51, 52, 53, 44, 45]))],
    [(10, _fp([0, 1, 2, 3])), (11, _fp([0, 1, 2, 3, 5])), (12, _fp([9, 18, 27, 36, 45, 54]))],
    [(20, _fp([9, 18, 27, 36, 45, 54])), (21, _fp([7, 14, 21, 28, 35, 42, 49, 56]))],
]


def _passthrough_fingerprinter(docs):
    return docs.select(F.col("media_id"), F.col("fp").alias("phash"))


_MTIME = [1_700_000_000]


def _write_epoch(path, rows):
    with open(path, "w") as f:
        for mid, fp in rows:
            f.write(json.dumps({"media_id": mid, "fp": fp}) + "\n")
    # Spark's FileStreamSource orders files by modification time; files
    # written within the same clock tick arrive in ARBITRARY order, so
    # pin strictly increasing mtimes to make epochs deterministic
    import os

    _MTIME[0] += 60
    os.utime(path, (_MTIME[0], _MTIME[0]))


@pytest.fixture()
def pipe(spark, tmp_path):
    cfg = MultimodalIngestConfig(
        root=str(tmp_path / "fpindex"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        fingerprinter=_passthrough_fingerprinter,
    )
    return MultimodalIngestPipeline(spark, cfg)


def _run_stream(spark, pipe, input_dir):
    raw = (
        spark.readStream.schema(RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(input_dir))
    )
    q = pipe.start(raw)
    q.awaitTermination(120)


def _df(spark, rows):
    return spark.createDataFrame(rows, ["media_id", "fp"]).withColumn(
        "media_id", F.col("media_id").cast("long")
    )


def _chain_replay(spark, epochs):
    """The stateless oracle: accepted(e) = epoch_e minus
    phash_screen(epoch_e, accepted(<e)); returns (accepted_df, matches
    list of (member, dup_of, hamming, epoch))."""
    accepted = _df(spark, epochs[0]).select(
        "media_id", F.col("fp").alias("phash")
    )
    matches = []
    for e, rows in enumerate(epochs[1:], start=1):
        batch = _df(spark, rows).select("media_id", F.col("fp").alias("phash"))
        m = phash_screen(batch, accepted, max_hamming=8)
        rowsm = [(r["member_id"], r["dup_of"], r["hamming"], e) for r in m.collect()]
        matches.extend(rowsm)
        flagged = m.select(F.col("member_id").alias("media_id")).distinct()
        accepted = accepted.unionByName(batch.join(flagged, "media_id", "left_anti"))
    return accepted, sorted(matches)


def test_stream_equals_batch_acceptance_chain(spark, tmp_path, pipe):
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    for e, rows in enumerate(EPOCHS):
        _write_epoch(input_dir / f"epoch{e}.json", rows)
    _run_stream(spark, pipe, input_dir)

    want_accepted, want_matches = _chain_replay(spark, EPOCHS)
    got_fps = {r["fp"]: r["gmin"] for r in pipe.index.fingerprints().collect()}
    want_fps = {
        r["phash"]: r["media_id"]
        for r in want_accepted.groupBy("phash")
        .agg(F.min("media_id").alias("media_id"))
        .collect()
    }
    assert got_fps == want_fps
    got_matches = sorted(
        (r["member_id"], r["dup_of"], r["hamming"], r["epoch"])
        for r in pipe.matches().collect()
    )
    assert got_matches == want_matches
    # the specific structure: 10 exact-dups 0, 11 near-dups 0 at h1,
    # 20 exact-dups 12 (a doc accepted in epoch 1, not epoch 0)
    assert (10, 0, 0, 1) in got_matches
    assert (11, 0, 1, 1) in got_matches
    assert (20, 12, 0, 2) in got_matches
    assert pipe._ingested_epochs() == {0, 1, 2}


def test_restart_replays_nothing_and_ingests_new_file(spark, tmp_path, pipe):
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    for e, rows in enumerate(EPOCHS):
        _write_epoch(input_dir / f"epoch{e}.json", rows)
    _run_stream(spark, pipe, input_dir)
    v_before = pipe.index.index.current_version()
    n_matches = pipe.matches().count()

    # restart with the SAME checkpoint: nothing new → no version movement
    _run_stream(spark, pipe, input_dir)
    assert pipe.index.index.current_version() == v_before
    assert pipe.matches().count() == n_matches

    # a fourth file: an exact dup of epoch-2's novel doc + one novel
    _write_epoch(
        input_dir / "epoch3.json",
        [(30, _fp([7, 14, 21, 28, 35, 42, 49, 56])),
         (31, _fp([4, 10, 16, 22, 32, 38, 47, 58, 5, 11, 17, 23]))],
    )
    _run_stream(spark, pipe, input_dir)
    assert pipe._ingested_epochs() == {0, 1, 2, 3}
    got = {(r["member_id"], r["dup_of"], r["epoch"]) for r in pipe.matches().collect()}
    assert (30, 21, 3) in got
    fps = {r["fp"] for r in pipe.index.fingerprints().collect()}
    assert _fp([4, 10, 16, 22, 32, 38, 47, 58, 5, 11, 17, 23]) in fps


def test_crash_between_matches_log_and_commit_is_idempotent(spark, tmp_path, pipe):
    pipe.run_batch(_df(spark, EPOCHS[0]), epoch_id=0)
    v0 = pipe.index.index.current_version()

    # simulate a crash AFTER the matches log, BEFORE the index commit
    real_append = pipe.index.index.append_delta

    def boom(*a, **k):
        raise RuntimeError("crash before commit")

    pipe.index.index.append_delta = boom
    with pytest.raises(RuntimeError):
        pipe.run_batch(_df(spark, EPOCHS[1]), epoch_id=1)
    pipe.index.index.append_delta = real_append
    # epoch 1 not marked, index untouched
    assert pipe._ingested_epochs() == {0}
    assert pipe.index.index.current_version() == v0

    # the replay completes the epoch; final state == clean run
    pipe.run_batch(_df(spark, EPOCHS[1]), epoch_id=1)
    assert pipe._ingested_epochs() == {0, 1}
    got = sorted(
        (r["member_id"], r["dup_of"], r["hamming"], r["epoch"])
        for r in pipe.matches().collect()
    )
    assert (10, 0, 0, 1) in got and (11, 0, 1, 1) in got
    fps = {r["fp"]: r["gmin"] for r in pipe.index.fingerprints().collect()}
    assert fps[_fp([9, 18, 27, 36, 45, 54])] == 12  # epoch-1 novel accepted once


def test_default_fingerprinter_runs_real_codec_path(spark, tmp_path):
    from tipoca_stream_spark.operators.phash import phash_from_documents
    from tipoca_stream_spark.sources.tables import load_table

    cfg = MultimodalIngestConfig(
        root=str(tmp_path / "fpidx"), checkpoint_dir=str(tmp_path / "ck")
    )
    pipe = MultimodalIngestPipeline(spark, cfg)
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    ).limit(40)
    pipe.run_batch(docs, epoch_id=0)
    want = (
        phash_from_documents(docs).select("phash").distinct().count()
    )
    assert pipe.index.fingerprints().count() == want


def test_epoch_guard_survives_maintenance(spark, tmp_path):
    """Compaction/vacuum commit fresh versions; metadata=None carries the
    current version's metadata forward (sources/target.py), so the epoch
    guard must survive a policy-on ingest — a restart after mid-stream
    maintenance must replay nothing."""
    from tipoca_stream_spark.operators.index_maintenance import (
        IndexMaintenancePolicy,
    )

    pol = IndexMaintenancePolicy(compact_files_per_bucket=1, vacuum_keep=2)
    cfg = MultimodalIngestConfig(
        root=str(tmp_path / "fpindex"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        fingerprinter=_passthrough_fingerprinter,
        policy=pol,
    )
    pipe = MultimodalIngestPipeline(spark, cfg)
    for e, rows in enumerate(EPOCHS):
        pipe.run_batch(_df(spark, rows), epoch_id=e)
    assert any(h.get("compacted_buckets") for h in pol.history), pol.history
    assert pipe._ingested_epochs() == {0, 1, 2}
    v = pipe.index.index.current_version()
    n = pipe.index.fingerprints().count()
    for e, rows in enumerate(EPOCHS):  # replay all: guard must skip all
        pipe.run_batch(_df(spark, rows), epoch_id=e)
    assert pipe.index.index.current_version() == v
    assert pipe.index.fingerprints().count() == n
