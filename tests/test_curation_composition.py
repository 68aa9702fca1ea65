"""End-to-end corpus CURATION composition over the real documents table:
quality gate → langid → canonical near-dup keepers → duplicated-span
audit → deterministic train/val split → shard accounting. Every stage is
oracle/unit-tested on its own; this pins the cross-stage invariants a
real curation run depends on — the complement of
test_ingest_composition.py's per-batch ingest path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tipoca_stream_spark.operators.text import gopher_quality, langid
from tipoca_stream_spark.plans import QUERIES


@pytest.fixture(scope="module")
def curated(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    gate = gopher_quality(docs, "text", "doc_id").select("doc_id", "passes_gopher")
    lid = langid(docs, "text", "doc_id").select(
        "doc_id", F.col("lang_guess").alias("lang_pred")
    )
    clean = (
        docs.join(gate, "doc_id")
        .join(lid, "doc_id")
        .filter(F.col("passes_gopher"))
    )
    keepers = QUERIES["dedup_canonical_docs"].fn(spark, sf_dir)
    curated = clean.join(
        keepers.select(F.col("canonical_doc_id").alias("doc_id")),
        "doc_id",
        "left_semi",
    ).persist()
    curated.count()
    return docs, clean, keepers, curated


def test_curation_only_shrinks_and_keeps_schema(spark, curated):
    docs, clean, keepers, cur = curated
    assert cur.count() <= clean.count() <= docs.count()
    assert set(docs.columns) <= set(cur.columns)


def test_no_exact_duplicate_texts_survive(spark, curated):
    _, _, _, cur = curated
    assert cur.count() == cur.select("text").distinct().count()


def test_keepers_are_real_docs_one_per_cluster(spark, curated):
    docs, _, keepers, _ = curated
    ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    krows = keepers.collect()
    assert all(r["canonical_doc_id"] in ids for r in krows)
    assert len({r["component"] for r in krows}) == len(krows)  # one keeper/cluster


def test_split_partitions_curated_set(spark, curated):
    _, _, _, cur = curated
    # hash-deterministic split: same rule as corpus_train_split
    frac = F.pmod(F.xxhash64("doc_id", F.lit(42)), F.lit(100))
    tagged = cur.withColumn(
        "split", F.when(frac < 90, "train").otherwise("val")
    ).persist()
    n = tagged.count()
    by = {r["split"]: r["n"] for r in tagged.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(by.values()) == n and set(by) == {"train", "val"}
    # determinism: recomputing yields the identical assignment
    again = cur.withColumn("split", F.when(frac < 90, "train").otherwise("val"))
    assert (
        tagged.select("doc_id", "split")
        .exceptAll(again.select("doc_id", "split"))
        .count()
        == 0
    )
    tagged.unpersist()


def test_dup_span_audit_runs_on_curated_docs(spark, curated):
    from tipoca_stream_spark.plans.quality import dup_spans

    _, _, _, cur = curated
    spans = dup_spans(cur.select("doc_id", "text"))
    # exact dups are gone, so any surviving span is strictly partial-copy;
    # every span must point at a curated doc and lie inside its text
    joined = spans.join(
        cur.select("doc_id", F.size(F.split("text", " ")).alias("n_words")),
        "doc_id",
    )
    bad = joined.filter(
        (F.col("span_start") < 1) | (F.col("span_end") > F.col("n_words"))
    )
    assert bad.count() == 0


def test_shard_accounting_conserves_docs(spark, curated):
    _, _, _, cur = curated
    shards = cur.withColumn(
        "shard", F.pmod(F.xxhash64("doc_id"), F.lit(8))
    ).groupBy("shard").agg(F.count("*").alias("n_docs"))
    rows = shards.collect()
    assert sum(r["n_docs"] for r in rows) == cur.count()
    assert len(rows) <= 8
