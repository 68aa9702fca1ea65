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
