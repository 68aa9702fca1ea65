"""IncrementalDeduper: batch-vs-corpus screening through the persisted
band-key index — exact copies and near-copies of indexed docs are
rejected, novel docs accepted, the index only ever grows by accepted
signatures (rejected dups must not poison it), each screen reads only
the batch's band buckets, and each ingest commits O(batch) IO (every
existing index file hard-links into the new version)."""

from __future__ import annotations

import os

from tipoca_stream_spark.operators.incremental_dedup import IncrementalDeduper

DOCS1 = [
    ("a1", "the quick brown fox jumps over the lazy dog near the river bank"),
    ("a2", "machine learning models need large clean training corpora to work"),
    ("a3", "completely unrelated text about cooking pasta with fresh tomatoes"),
]
DOCS2 = [
    # exact copy of a1 under a new id
    ("b1", "the quick brown fox jumps over the lazy dog near the river bank"),
    # near-copy of a2 (one word changed)
    ("b2", "machine learning models need large clean training datasets to work"),
    # novel
    ("b3", "astronomy surveys scan the sky for transient events every night"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_first_batch_bootstraps_index(spark, tmp_path):
    d = IncrementalDeduper(spark, str(tmp_path))
    accepted, pairs = d.ingest(_df(spark, DOCS1))
    assert sorted(r["doc_id"] for r in accepted.collect()) == ["a1", "a2", "a3"]
    assert pairs.count() == 0
    assert d.signatures().count() == 3
    # denormalized band index: one row per (doc, band)
    assert d.index.read().count() == 3 * (d.n_hashes // d.band_size)


def test_second_batch_screens_against_corpus(spark, tmp_path):
    d = IncrementalDeduper(spark, str(tmp_path))
    d.ingest(_df(spark, DOCS1))
    accepted, pairs = d.ingest(_df(spark, DOCS2))
    acc = sorted(r["doc_id"] for r in accepted.collect())
    hits = {(r["new_id"], r["corpus_id"]) for r in pairs.collect()}
    assert ("b1", "a1") in hits  # exact copy: all signatures agree
    assert ("b2", "a2") in hits  # near-copy caught by banding + estimator
    assert acc == ["b3"]
    # index grew only by the accepted doc
    assert d.signatures().count() == 4
    ids = {r["doc_id"] for r in d.index.read().collect()}
    assert ids == {"a1", "a2", "a3", "b3"}


def test_exact_copy_estimates_full_jaccard(spark, tmp_path):
    d = IncrementalDeduper(spark, str(tmp_path))
    d.ingest(_df(spark, DOCS1))
    _, pairs = d.ingest(_df(spark, [("c1", DOCS1[0][1])]))
    row = pairs.filter("new_id = 'c1'").collect()[0]
    assert row["corpus_id"] == "a1" and row["est_jaccard"] == 1.0


def test_crashed_ingest_leaves_previous_index(spark, tmp_path):
    d = IncrementalDeduper(spark, str(tmp_path))
    d.ingest(_df(spark, DOCS1))
    v_before = d.index.current_version()
    # a second deduper on the same root sees the committed index even if
    # another ingest never completes (versioned commit = crash safety)
    d2 = IncrementalDeduper(spark, str(tmp_path))
    assert d2.index.current_version() == v_before
    assert d2.signatures().count() == 3


def test_ingest_commits_o_batch_every_prior_file_links(spark, tmp_path):
    """The r7→r8 fix: an accepted batch must never read back or rewrite
    the accumulated index. Every file of the previous version rides into
    the new one by hard link; only the batch's band rows are written."""
    d = IncrementalDeduper(spark, str(tmp_path))
    d.ingest(_df(spark, DOCS1))
    prior = {
        os.stat(f).st_ino
        for f in d.index._version_files(d.index._vdir(d.index.current_version()))
    }
    d.ingest(_df(spark, DOCS2))
    now = {
        os.stat(f).st_ino
        for f in d.index._version_files(d.index._vdir(d.index.current_version()))
    }
    assert prior <= now
    stats = d.index.last_commit_stats
    assert stats["files_linked"] == len(prior)
    # written files ∝ the accepted batch's band buckets, not the corpus
    assert 0 < stats["files_written"] <= d.index.buckets


def test_multi_epoch_write_cost_stays_flat(spark, tmp_path):
    """Soak the shape: as the index grows across epochs, per-ingest
    files_written stays bounded by the batch's buckets while
    files_linked grows with the corpus — O(batch) commits on a growing
    index."""
    import random

    d = IncrementalDeduper(spark, str(tmp_path))
    written, linked = [], []
    for e in range(4):
        rows = [
            (
                f"e{e}d{i}",
                " ".join(
                    f"w{random.Random(e * 10000 + i * 100 + j).randrange(10**9)}"
                    for j in range(12)
                ),
            )
            for i in range(6)
        ]
        d.ingest(_df(spark, rows))
        if d.index.last_commit_stats:
            written.append(d.index.last_commit_stats.get("files_written", 0))
            linked.append(d.index.last_commit_stats.get("files_linked", 0))
    assert d.signatures().count() == 24
    # flat write cost, monotonically growing linked share
    assert all(w <= d.index.buckets for w in written)
    assert linked == sorted(linked) and linked[-1] > linked[0]


def test_screen_reads_only_the_batch_buckets(spark, tmp_path):
    """File-level pruning on the screen itself: once the index spans many
    band buckets, screening a one-doc batch schedules only the files of
    that batch's band keys."""
    d = IncrementalDeduper(spark, str(tmp_path))
    rows = [
        (f"d{i}", f"document number {i} with its own unique vocabulary "
                  f"stream alpha{i} beta{i} gamma{i} delta{i} epsilon{i}")
        for i in range(40)
    ]
    d.ingest(_df(spark, rows))
    d.ingest(_df(spark, [("z1", rows[0][1])]))  # 1-doc batch, exact dup
    st = d.last_screen_stats
    assert st["files_scanned"] < st["files_total"], st


def test_empty_batches_are_safe(spark, tmp_path):
    """Empty batches are routine in a live ingest loop (an upstream gate
    can pass nothing): empty-first bootstrap, empty-after-real, and an
    empty screen must all work and leave the index consistent."""
    d = IncrementalDeduper(spark, str(tmp_path))
    empty = _df(spark, DOCS1).filter("doc_id = 'nope'")
    accepted, dups = d.ingest(empty)
    assert accepted.count() == 0 and dups.count() == 0
    accepted, dups = d.ingest(_df(spark, DOCS1))
    assert accepted.count() == len(DOCS1)
    assert d.screen(empty).count() == 0
    accepted, dups = d.ingest(empty)
    assert accepted.count() == 0 and dups.count() == 0
    # the real corpus is still fully indexed: an exact re-ingest dedups
    acc2, dup2 = d.ingest(_df(spark, DOCS1))
    assert acc2.count() == 0 and dup2.count() == len(DOCS1)
