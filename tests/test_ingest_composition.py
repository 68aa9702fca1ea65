"""End-to-end document-ingest composition: quality gate → incremental
batch-vs-corpus dedup → versioned target with CDF. Each stage is already
unit/oracle-tested; this pins that they compose — the shape a real
training-data ingest runs every batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from tipoca_stream_spark.operators.incremental_dedup import IncrementalDeduper
from tipoca_stream_spark.operators.text import gopher_quality
from tipoca_stream_spark.sources.target import ParquetTargetTable

GOOD = "the quick brown fox jumps over the lazy dog and then rests in the shade of a tree"
BATCH1 = [
    ("a1", GOOD),
    ("a2", "machine learning systems need large and clean corpora for the training to work well"),
    ("a3", "@@@@ #### %%%% !!!! ^^^^ &&&& **** (((( )))) $$$$"),  # fails gopher gate
]
BATCH2 = [
    ("b1", GOOD),  # duplicate of accepted a1 → rejected by dedup
    ("b2", "astronomy surveys scan the whole sky and record transient events in every clear night"),
    ("b3", "zz xx qq ww"),  # too short → gate
]


def _ingest(spark, root, deduper, target, rows):
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    gate = gopher_quality(docs, "text", "doc_id").select("doc_id", "passes_gopher")
    clean = docs.join(gate.filter("passes_gopher"), "doc_id").select("doc_id", "text")
    accepted, pairs = deduper.ingest(clean)
    existing = target.read() if target.exists() else None
    out = accepted if existing is None else existing.unionByName(accepted)
    target.write(out)
    return accepted, pairs


def test_gate_then_dedup_then_target(spark, tmp_path):
    deduper = IncrementalDeduper(spark, str(tmp_path / "index"))
    target = ParquetTargetTable(spark, str(tmp_path), "corpus")

    acc1, pairs1 = _ingest(spark, tmp_path, deduper, target, BATCH1)
    assert sorted(r["doc_id"] for r in acc1.collect()) == ["a1", "a2"]  # a3 gated
    assert pairs1.count() == 0

    acc2, pairs2 = _ingest(spark, tmp_path, deduper, target, BATCH2)
    assert sorted(r["doc_id"] for r in acc2.collect()) == ["b2"]  # b1 dup, b3 gated
    assert {(r["new_id"], r["corpus_id"]) for r in pairs2.collect()} == {("b1", "a1")}

    final = {r["doc_id"] for r in target.read().collect()}
    assert final == {"a1", "a2", "b2"}
    # the target's CDF between the two commits is exactly the accepted batch
    v1, v2 = target.versions()
    ch = target.changes(v1, v2, keys=["doc_id"]).collect()
    assert {(r["_change_type"], r["doc_id"]) for r in ch} == {("insert", "b2")}
    # and the dedup index holds signatures for exactly the accepted corpus
    assert {r["doc_id"] for r in deduper.index.read().collect()} == final
