"""IncrementalDeduper: batch-vs-corpus screening through the persisted
signature index — exact copies and near-copies of indexed docs are
rejected, novel docs accepted, and the index only ever grows by accepted
signatures (rejected dups must not poison it)."""

from __future__ import annotations

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
    assert d.index.read().count() == 3


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
    assert d.index.read().count() == 4
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
    assert d2.index.read().count() == 3
