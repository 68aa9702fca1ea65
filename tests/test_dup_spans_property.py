"""Property test for the text_dup_spans pipeline: a brute-force Python
span merger triangulates the Spark/DuckDB pair (two engines can share a
misunderstanding; three can't share it silently)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from tipoca_stream_spark.plans.quality import DUP_L


def _py_dup_spans(docs, L=DUP_L):
    """docs: {doc_id: text}. Returns {(doc_id, start, end, n_windows)}."""
    grams = {}
    pos = {}
    for d, text in docs.items():
        w = text.split(" ")
        pos[d] = []
        for i in range(1, len(w) - L + 2):
            g = " ".join(w[i - 1 : i - 1 + L])
            grams.setdefault(g, set()).add(d)
            pos[d].append((i, g))
    dup = {g for g, ds in grams.items() if len(ds) >= 2}
    out = set()
    for d, hits in pos.items():
        starts = sorted(i for i, g in hits if g in dup)
        if not starts:
            continue
        cur = [starts[0], starts[0] + L - 1, 1]
        for s in starts[1:]:
            if s <= cur[1] + 1:
                cur[1] = max(cur[1], s + L - 1)
                cur[2] += 1
            else:
                out.add((d, cur[0], cur[1], cur[2]))
                cur = [s, s + L - 1, 1]
        out.add((d, cur[0], cur[1], cur[2]))
    return out


def _spark_dup_spans(spark, docs):
    from tipoca_stream_spark.plans.quality import dup_spans

    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string"
    )
    return {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
        for r in dup_spans(df).collect()
    }


@pytest.mark.parametrize("seed", [101, 102, 103, 104])
def test_dup_spans_match_python_oracle(spark, seed):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]
    shared = " ".join(rng.choice(vocab) for _ in range(12))
    docs = {}
    for d in range(12):
        words = [rng.choice(vocab) for _ in range(rng.randrange(3, 40))]
        if d % 3 == 0:  # plant a shared block at a random offset
            at = rng.randrange(0, len(words))
            words[at:at] = shared.split(" ")
        docs[d] = " ".join(words)
    assert _spark_dup_spans(spark, docs) == _py_dup_spans(docs)


def test_dup_spans_empty_when_no_overlap(spark):
    docs = {1: "a b c d e f g", 2: "h i j k l m n"}
    assert _spark_dup_spans(spark, docs) == set()
