"""Incremental semantic dedup (operators/incremental_semantic.py).

Pins: a multi-epoch ingest accepts exactly the non-duplicate remainder
each epoch and flags near-twins of ACCEPTED members (never of rejected
ones); a restarted instance (fresh object, persisted index + seeds)
screens identically; the index version count stays O(epochs) with the
atomic commit leaving no partial state; and a racing ingest loses the
CAS instead of silently dropping the winner's accepted vectors."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tipoca_stream_spark.operators.incremental_semantic import (
    IncrementalSemanticDeduper,
)
from tipoca_stream_spark.sources.target import ConcurrentWriteError

DIM = 16

SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)

SEED_SCHEMA = T.StructType(
    [
        T.StructField("seed_id", T.LongType()),
        T.StructField("seed_vec", T.ArrayType(T.DoubleType())),
    ]
)


def _vectors(ids, seed=31):
    out = []
    for i in ids:
        rng = random.Random(seed * 1_000_003 + i)
        out.append((i, [rng.gauss(0.0, 1.0) for _ in range(DIM)]))
    return out


def _scaled(rows, offset, factor=1.5):
    return [(i + offset, [x * factor for x in v]) for i, v in rows]


def test_multi_epoch_ingest_and_restart(spark, tmp_path):
    root = str(tmp_path / "semidx")
    e1 = _vectors(range(0, 40))
    seeds = spark.createDataFrame(
        [(i, v) for i, v in e1[:4]], SEED_SCHEMA
    )
    d = IncrementalSemanticDeduper(spark, root, seeds=seeds, threshold=0.999)

    # epoch 1: empty index accepts everything
    n1, flagged1 = d.ingest(spark.createDataFrame(e1, SCHEMA))
    assert n1 == 40 and flagged1.count() == 0

    # epoch 2: fresh vectors + copies of epoch-1 members → copies flagged,
    # each resolved to its accepted original
    e2 = _vectors(range(100, 120), seed=37)
    copies = _scaled(e1[:5], 10_000)
    n2, flagged2 = d.ingest(spark.createDataFrame(e2 + copies, SCHEMA))
    got = {r["vec_id"]: r["dup_of"] for r in flagged2.collect()}
    assert got == {i + 10_000: i for i, _ in e1[:5]}
    assert n2 == 20

    # epoch 3 on a RESTARTED instance (no seeds passed — loaded from the
    # index root): copies of epoch-2 accepted members are flagged; copies
    # of epoch-2 REJECTED ids are not in the index, so their twins pass
    d2 = IncrementalSemanticDeduper(spark, root, threshold=0.999)
    copies3 = _scaled(e2[:3], 20_000)
    twin_of_rejected = _scaled(_scaled(e1[:1], 10_000), 20_000, factor=0.5)
    n3, flagged3 = d2.ingest(
        spark.createDataFrame(copies3 + twin_of_rejected, SCHEMA)
    )
    got3 = {r["vec_id"]: r["dup_of"] for r in flagged3.collect()}
    # the rejected id's twin IS a twin of the epoch-1 original still in the
    # index (scaling chains preserve cosine) → flagged against the ORIGINAL
    assert got3[30_000] == 0
    assert {k: v for k, v in got3.items() if k != 30_000} == {
        i + 20_000: i for i, _ in e2[:3]
    }
    assert n3 == 0

    # index grew one version per epoch, atomically
    assert len(d2.index.versions()) >= 2  # keep=2 retention window
    idx_ids = {r["vec_id"] for r in d2.index.read().collect()}
    assert idx_ids == {i for i, _ in e1} | {i for i, _ in e2}


def test_screen_is_cluster_confined(spark, tmp_path):
    """The candidate join must key on cluster_id (no cartesian product) —
    the persisted assignment is the prune."""
    import contextlib
    import io

    root = str(tmp_path / "semplan")
    rows = _vectors(range(0, 30))
    seeds = spark.createDataFrame([(i, v) for i, v in rows[:4]], SEED_SCHEMA)
    d = IncrementalSemanticDeduper(spark, root, seeds=seeds)
    d.ingest(spark.createDataFrame(rows, SCHEMA))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        d.screen(spark.createDataFrame(_vectors(range(50, 60), seed=41), SCHEMA)).explain(
            "formatted"
        )
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "cluster_id" in plan


def test_racing_ingest_loses_cas_and_retry_converges(spark, tmp_path):
    """Two ingests racing on one index: the loser raises (its screen ran
    against a stale index version) and a retry flags against the winner's
    accepted rows instead of re-accepting a duplicate."""
    root = str(tmp_path / "semrace")
    base = _vectors(range(0, 20))
    seeds = spark.createDataFrame([(i, v) for i, v in base[:4]], SEED_SCHEMA)
    d = IncrementalSemanticDeduper(spark, root, seeds=seeds)
    d.ingest(spark.createDataFrame(base, SCHEMA))
    other = IncrementalSemanticDeduper(spark, root)

    winner_rows = _vectors(range(200, 210), seed=43)
    loser_rows = _scaled(winner_rows[:2], 5_000)  # dups of the winner's batch

    orig = type(d.index).current_version
    calls = {"n": 0}

    def stale_then_real(self):
        calls["n"] += 1
        if calls["n"] == 1 and self.path.endswith("sem_index") and "semrace" in self.path:
            v = orig(self)
            other.ingest(spark.createDataFrame(winner_rows, SCHEMA))
            return v
        return orig(self)

    type(d.index).current_version = stale_then_real
    try:
        with pytest.raises(ConcurrentWriteError):
            d.ingest(spark.createDataFrame(loser_rows, SCHEMA))
    finally:
        type(d.index).current_version = orig

    # retry converges: the winner's rows are in the index now, so the
    # loser's duplicates are flagged, not accepted
    n, flagged = d.ingest(spark.createDataFrame(loser_rows, SCHEMA))
    assert n == 0
    assert {r["vec_id"]: r["dup_of"] for r in flagged.collect()} == {
        i + 5_000: i for i, _ in winner_rows[:2]
    }


def test_ingest_commits_o_batch_every_prior_file_links(spark, tmp_path):
    """The r7→r8 fix: an accepted batch must never read back or rewrite
    the accumulated index — every prior file hard-links into the new
    version and only the batch's cluster buckets gain files."""
    root = str(tmp_path / "semob")
    base_rows = _vectors(range(0, 40))
    seeds = spark.createDataFrame([(i, v) for i, v in base_rows[:4]], SEED_SCHEMA)
    d = IncrementalSemanticDeduper(spark, root, seeds=seeds)
    d.ingest(spark.createDataFrame(base_rows, SCHEMA))
    import os

    prior = {
        os.stat(f).st_ino
        for f in d.index._version_files(d.index._vdir(d.index.current_version()))
    }
    d.ingest(spark.createDataFrame(_vectors(range(100, 110), seed=53), SCHEMA))
    now = {
        os.stat(f).st_ino
        for f in d.index._version_files(d.index._vdir(d.index.current_version()))
    }
    assert prior <= now
    st = d.index.last_commit_stats
    assert st["files_linked"] == len(prior)
    assert 0 < st["files_written"] <= d.index.buckets


def test_screen_reads_only_the_batch_cluster_buckets(spark, tmp_path):
    """File-level pruning: with a many-cluster quantizer, screening a
    batch that lands in ONE cluster schedules only that cluster's bucket
    files — the route_read discipline applied to the index itself."""
    root = str(tmp_path / "semprune")
    rows = _vectors(range(0, 120))
    seeds = spark.createDataFrame([(i, v) for i, v in rows[:24]], SEED_SCHEMA)
    d = IncrementalSemanticDeduper(spark, root, seeds=seeds)
    d.ingest(spark.createDataFrame(rows, SCHEMA))
    # one batch vector = a scaled copy of one corpus member → one cluster
    d.screen(spark.createDataFrame(_scaled(rows[:1], 9_000), SCHEMA)).collect()
    st = d.last_screen_stats
    assert st["files_scanned"] < st["files_total"], st


def test_requantize_grows_k_and_preserves_screening(spark, tmp_path):
    """requantize re-assigns under a larger quantizer as one CAS commit:
    k grows, copies of corpus members are still flagged to the same
    dup_of, and the index version carries its seeds version."""
    root = str(tmp_path / "semreq")
    rows = _vectors(range(0, 60))
    seeds = spark.createDataFrame([(i, v) for i, v in rows[:4]], SEED_SCHEMA)
    d = IncrementalSemanticDeduper(spark, root, seeds=seeds)
    d.ingest(spark.createDataFrame(rows, SCHEMA))

    before = d.screen(spark.createDataFrame(_scaled(rows[:6], 7_000), SCHEMA))
    got_before = {r["vec_id"]: r["dup_of"] for r in before.collect()}
    assert got_before == {i + 7_000: i for i, _ in rows[:6]}

    v = d.requantize(d.grown_seeds(target_per_cluster=5))
    assert d.index.current_version() == v
    assert d.seeds.count() == 12  # ceil(60/5)
    # same twins, same representatives, under the new quantizer
    after = d.screen(spark.createDataFrame(_scaled(rows[:6], 7_000), SCHEMA))
    got_after = {r["vec_id"]: r["dup_of"] for r in after.collect()}
    assert got_after == got_before
    # the index still holds exactly the accepted corpus (re-assigned)
    assert d.index.read().count() == 60
    # a restarted instance resolves the NEW quantizer from the commit
    d2 = IncrementalSemanticDeduper(spark, root)
    assert d2.seeds.count() == 12


def test_maybe_requantize_keeps_density_bounded(spark, tmp_path):
    """The ingest-loop hook: as the corpus grows past the density target,
    maybe_requantize grows k; below the target it is a no-op."""
    root = str(tmp_path / "semgrow")
    rows = _vectors(range(0, 20))
    seeds = spark.createDataFrame([(i, v) for i, v in rows[:4]], SEED_SCHEMA)
    d = IncrementalSemanticDeduper(spark, root, seeds=seeds)
    d.ingest(spark.createDataFrame(rows, SCHEMA))
    assert d.maybe_requantize(target_per_cluster=8) is None  # 20 ≤ 4*8
    d.ingest(spark.createDataFrame(_vectors(range(100, 160), seed=59), SCHEMA))
    v = d.maybe_requantize(target_per_cluster=8)  # 80 > 4*8 → grow
    assert v is not None
    assert d.seeds.count() == 10  # ceil(80/8)
    # density restored: a second call is a no-op again
    assert d.maybe_requantize(target_per_cluster=8) is None


def test_racing_ingest_and_requantize_one_winner(spark, tmp_path):
    """An ingest that captured its base before a requantize commits must
    LOSE the CAS (its assignments were made under the old quantizer);
    the retry re-assigns under the new seeds and converges."""
    root = str(tmp_path / "semreqrace")
    rows = _vectors(range(0, 40))
    seeds = spark.createDataFrame([(i, v) for i, v in rows[:4]], SEED_SCHEMA)
    d = IncrementalSemanticDeduper(spark, root, seeds=seeds)
    d.ingest(spark.createDataFrame(rows, SCHEMA))
    other = IncrementalSemanticDeduper(spark, root)

    batch = _vectors(range(300, 310), seed=61)
    orig = type(d.index).current_version
    calls = {"n": 0}

    def stale_then_real(self):
        calls["n"] += 1
        if calls["n"] == 1 and "semreqrace" in self.path:
            v = orig(self)
            other.requantize(other.grown_seeds(target_per_cluster=5))
            return v
        return orig(self)

    type(d.index).current_version = stale_then_real
    try:
        with pytest.raises(ConcurrentWriteError):
            d.ingest(spark.createDataFrame(batch, SCHEMA))
    finally:
        type(d.index).current_version = orig

    n, flagged = d.ingest(spark.createDataFrame(batch, SCHEMA))
    assert n == 10 and flagged.count() == 0
    # the retried commit was assigned under the requantized seeds
    assert d.index.read_metadata()["seeds_version"] == 2
    assert d.index.read().count() == 50


def test_requantize_loser_removes_staged_seeds(spark, tmp_path):
    """A requantize that loses its CAS must not leave its staged seeds
    dir to shadow a retry's quantizer."""
    root = str(tmp_path / "semreqlose")
    rows = _vectors(range(0, 30))
    seeds = spark.createDataFrame([(i, v) for i, v in rows[:4]], SEED_SCHEMA)
    d = IncrementalSemanticDeduper(spark, root, seeds=seeds)
    d.ingest(spark.createDataFrame(rows, SCHEMA))
    other = IncrementalSemanticDeduper(spark, root)
    grown = d.grown_seeds(target_per_cluster=5)
    grown.collect()  # materialize before the pointer moves

    orig = type(d.index).current_version
    calls = {"n": 0}

    def stale_then_real(self):
        calls["n"] += 1
        if calls["n"] == 1 and "semreqlose" in self.path:
            v = orig(self)
            # someone else commits between the rebuild's base capture
            # and its pointer flip
            other.ingest(spark.createDataFrame(_vectors(range(50, 55), seed=67), SCHEMA))
            return v
        return orig(self)

    type(d.index).current_version = stale_then_real
    try:
        with pytest.raises(ConcurrentWriteError):
            d.requantize(grown)
    finally:
        type(d.index).current_version = orig
    assert d._staged_seed_versions() == [1]
    # state intact: the winner's commit serves
    assert d.index.read().count() == 35


def test_empty_batches_are_safe(spark, tmp_path):
    """Empty-first bootstrap, empty-after-real ingest, and an empty
    screen must all work (an upstream curation gate can pass nothing)."""
    root = str(tmp_path / "semidx_empty")
    rows = _vectors(range(0, 24))
    seeds = spark.createDataFrame([(i, v) for i, v in rows[:4]], SEED_SCHEMA)
    d = IncrementalSemanticDeduper(spark, root, seeds=seeds)
    df = spark.createDataFrame(rows, SCHEMA)
    empty = df.filter("vec_id < 0")
    n, rejected = d.ingest(empty)
    assert n == 0 and rejected.count() == 0
    n, rejected = d.ingest(df)
    assert n == len(rows)
    assert d.screen(empty).count() == 0
    n, rejected = d.ingest(empty)
    assert n == 0 and rejected.count() == 0
    # exact re-ingest still rejects everything: the index is intact
    n2, rej2 = d.ingest(df)
    assert n2 == 0 and rej2.count() == len(rows)


def test_bad_seed_schema_fails_loud(spark, tmp_path):
    """A wrong seeds schema fails at staging with a clear message, not
    later as an opaque AMBIGUOUS_REFERENCE in the assignment join."""
    import pytest as _pytest

    bad = spark.createDataFrame(_vectors(range(4)), SCHEMA)  # vec_id/embedding
    with _pytest.raises(ValueError, match="seed_id"):
        IncrementalSemanticDeduper(spark, str(tmp_path / "bad"), seeds=bad)


def test_two_level_assign_mode_persists_and_screens(spark, tmp_path):
    """assign_mode='two_level': the rule is part of the index version's
    identity — a RESTARTED instance (default flat config) must still
    screen with the stored two-level rule, and scaled copies of accepted
    members are flagged exactly (cosine scale-invariance survives the
    two-level route)."""
    root = str(tmp_path / "sem2l")
    rows = _vectors(range(0, 60))
    seeds = spark.createDataFrame([(i, v) for i, v in rows[:9]], SEED_SCHEMA)
    d = IncrementalSemanticDeduper(
        spark, root, seeds=seeds, threshold=0.999, assign_mode="two_level"
    )
    n, flagged = d.ingest(spark.createDataFrame(rows, SCHEMA))
    assert n == 60 and flagged.count() == 0
    # restarted instance with DEFAULT config: honors the stored mode
    d2 = IncrementalSemanticDeduper(spark, root, threshold=0.999)
    copies = _scaled(rows[:5], 70_000)
    got = {r["vec_id"]: r["dup_of"] for r in
           d2.screen(spark.createDataFrame(copies, SCHEMA)).collect()}
    assert got == {i + 70_000: i for i, _ in rows[:5]}
    # and the stored cluster ids were computed two-level: they must equal
    # a fresh two-level assignment of the same vectors under the same seeds
    from tipoca_stream_spark.operators.semantic_dedup import (
        assign_by_cosine_two_level,
    )

    stored = {r["vec_id"]: r["cluster_id"] for r in d2.index.read().collect()}
    fresh = {
        r["vec_id"]: r["cluster_id"]
        for r in assign_by_cosine_two_level(
            spark.createDataFrame(rows, SCHEMA), d2.seeds
        ).collect()
    }
    assert stored == fresh


def test_requantize_migrates_assign_mode(spark, tmp_path):
    """A flat-built index requantized by a two_level-configured instance
    migrates the rule (requantize re-assigns every row anyway); screens
    before and after both flag scaled copies of accepted members."""
    root = str(tmp_path / "semmig")
    rows = _vectors(range(0, 50))
    seeds = spark.createDataFrame([(i, v) for i, v in rows[:4]], SEED_SCHEMA)
    d = IncrementalSemanticDeduper(spark, root, seeds=seeds, threshold=0.999)
    d.ingest(spark.createDataFrame(rows, SCHEMA))
    assert d._mode_at(d.index.current_version()) == "flat"
    d2 = IncrementalSemanticDeduper(
        spark, root, threshold=0.999, assign_mode="two_level"
    )
    v = d2.maybe_requantize(target_per_cluster=8)  # 50 > 4*8 → fires
    assert v is not None
    assert d2._mode_at(v) == "two_level"
    copies = _scaled(rows[:3], 80_000)
    got = {r["vec_id"]: r["dup_of"] for r in
           d2.screen(spark.createDataFrame(copies, SCHEMA)).collect()}
    assert got == {i + 80_000: i for i, _ in rows[:3]}
