"""InvertedIndexTable: persisted postings/doclen/totals; BM25 off the
index must equal BM25 off the corpus scan, and the term probe must push
into the postings scan (sources/invindex.py)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from tipoca_stream_spark.operators import text as tx
from tipoca_stream_spark.sources.invindex import InvertedIndexTable


@pytest.fixture(scope="module")
def index(spark, sf_dir, tmp_path_factory):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = InvertedIndexTable(spark, str(tmp_path_factory.mktemp("inv")) + "/idx")
    idx.build(docs, "text", "doc_id")
    return idx, docs


@pytest.mark.parametrize("terms", [["stream", "hash", "table"], ["merge"], ["zzz-absent"]])
def test_index_served_equals_scan_served(spark, index, terms):
    idx, docs = index
    got = [(r["doc_id"], r["bm25"]) for r in idx.bm25_topk(terms, k=10).collect()]
    want = [
        (r["doc_id"], r["bm25"])
        for r in tx.bm25_topk(docs, "text", "doc_id", terms, k=10).collect()
    ]
    assert got == want


def test_term_filter_pushes_into_postings_scan(spark, index):
    idx, _ = index
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        idx.bm25_topk(["stream"], k=5).explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters: [" in plan and "term" in plan.split("PushedFilters: [")[1]
    assert "TakeOrderedAndProject" in plan


def test_totals_match_corpus(spark, index):
    idx, docs = index
    tot = spark.read.parquet(idx._totals).collect()[0]
    n_total_tokens = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .filter(F.col("t") != "")
        .count()
    )
    # n_docs counts docs with >= 1 non-empty TOKEN (build's definition) —
    # an all-spaces text has length > 0 but contributes no doc
    n_docs_tokenized = (
        docs.filter(
            F.size(F.filter(F.split("text", " "), lambda t: t != "")) > 0
        ).count()
    )
    assert tot["n_docs"] == float(n_docs_tokenized)
    assert abs(tot["avgdl"] * tot["n_docs"] - n_total_tokens) < 1e-6


def test_phrase_counts_match_text_rescan(spark, tmp_path):
    """Positional index phrase counts == brute adjacency over the raw
    text, including repeated-term phrases and multi-occurrence docs."""
    rows = [
        (1, "the hash table hash table wins"),
        (2, "hash table"),
        (3, "table hash"),
        (4, "the the the end"),
        (5, "no match here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from tipoca_stream_spark.sources.invindex import InvertedIndexTable

    idx = InvertedIndexTable(spark, str(tmp_path / "pos"))
    idx.build(docs, "text", "doc_id", positional=True)

    def counts(terms):
        return {
            r["doc_id"]: r["n_occurrences"]
            for r in idx.phrase_counts(terms).collect()
        }

    assert counts(["hash", "table"]) == {1: 2, 2: 1}
    assert counts(["table", "hash"]) == {1: 1, 3: 1}
    assert counts(["the", "the"]) == {4: 2}  # overlapping occurrences
    assert counts(["hash", "table", "hash"]) == {1: 1}
    assert counts(["absent", "phrase"]) == {}


def test_phrase_needs_positional_build(spark, tmp_path):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    from tipoca_stream_spark.sources.invindex import InvertedIndexTable

    idx = InvertedIndexTable(spark, str(tmp_path / "nopos"))
    idx.build(docs, "text", "doc_id")  # frequency-only
    with pytest.raises(FileNotFoundError):
        idx.phrase_counts(["a", "b"])
