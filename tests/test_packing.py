"""Sequence packing (operators/packing.py): fixed-length chunking of a
tokenized corpus against a driver-side reference, plus the scale pin
that the prefix sum never routes the corpus through one task."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from tipoca_stream_spark.operators import packing


def _seg(spark, docs):
    return spark.createDataFrame(docs, ["doc_id", "tokens"])


def ref_pack(docs, seq_len):
    """Concatenate in doc_id order, cut every seq_len tokens."""
    stream = []
    for _, toks in sorted(docs):
        stream.extend(toks)
    return {
        i // seq_len: stream[i : i + seq_len]
        for i in range(0, len(stream), seq_len)
    }


def check(spark, docs, seq_len):
    got = {
        r["seq_id"]: (r["n_tokens"], list(r["tokens"]))
        for r in packing.pack_sequences(_seg(spark, docs), seq_len).collect()
    }
    want = {
        sid: (len(toks), toks) for sid, toks in ref_pack(docs, seq_len).items()
    }
    assert got == want


def test_pack_small_exact(spark):
    docs = [(1, ["a", "b", "c"]), (2, ["d", "e"]), (3, ["f", "g", "h", "i"])]
    check(spark, docs, 4)


def test_pack_chunk_boundaries_and_tail(spark):
    docs = [(i, [f"t{i}_{j}" for j in range(i)]) for i in range(1, 8)]
    for seq_len in (1, 2, 5, 7, 100):
        check(spark, docs, seq_len)


def test_pack_skewed_giant_doc(spark):
    # one doc spans ~80 chunks; others are tiny; ids deliberately unordered
    rng = random.Random(7)
    docs = [(50, [f"g{j}" for j in range(10_000)])]
    docs += [
        (i, [f"d{i}_{j}" for j in range(rng.randrange(0, 9))])
        for i in list(range(1, 50)) + list(range(51, 120))
    ]
    check(spark, docs, 128)


def test_pack_empty_docs_skipped(spark):
    docs = [(1, []), (2, ["a", "b"]), (3, [])]
    check(spark, docs, 2)


def test_offsets_match_cumsum(spark):
    rng = random.Random(11)
    docs = [(i, [f"w{j}" for j in range(rng.randrange(0, 30))]) for i in range(200)]
    off = {
        r["doc_id"]: (r["n_tokens"], r["start"])
        for r in packing.global_token_offsets(_seg(spark, docs)).collect()
    }
    acc = 0
    for i, toks in sorted(docs):
        assert off[i] == (len(toks), acc), i
        acc += len(toks)


def test_offsets_plan_has_no_single_partition_stage(spark):
    """The 100 TB pin: the prefix sum must not be a global orderBy window
    (which Spark executes as Exchange SinglePartition → one task holding
    the corpus)."""
    docs = [(i, ["a"] * (i % 5)) for i in range(100)]
    df = packing.global_token_offsets(_seg(spark, docs))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    naive = _seg(spark, docs).withColumn(
        "start",
        F.sum(F.size("tokens")).over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy(
                "doc_id"
            )
        ),
    )
    naive_plan = naive._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" in naive_plan  # the shape being avoided


def ref_spans(docs, seq_len):
    """Per-chunk (doc_id, start_in_chunk, len) spans, in-chunk order."""
    spans: dict[int, list] = {}
    g = 0
    for doc_id, toks in sorted(docs):
        n = len(toks)
        if n == 0:
            continue
        pos = 0
        while pos < n:
            sid = (g + pos) // seq_len
            take = min(n - pos, (sid + 1) * seq_len - (g + pos))
            spans.setdefault(sid, []).append(
                (doc_id, (g + pos) % seq_len, take)
            )
            pos += take
        g += n
    return spans


def test_pack_with_spans_matches_reference(spark):
    rng = random.Random(3)
    docs = [(60, [f"g{j}" for j in range(1_000)])]  # spans many chunks
    docs += [
        (i, [f"d{i}_{j}" for j in range(rng.randrange(0, 9))])
        for i in list(range(1, 60)) + list(range(61, 120))
    ]
    for seq_len in (7, 128):
        got = {
            r["seq_id"]: (
                r["n_tokens"],
                list(r["tokens"]),
                [(s["doc_id"], s["start"], s["len"]) for s in r["spans"]],
            )
            for r in packing.pack_sequences_with_spans(
                _seg(spark, docs), seq_len
            ).collect()
        }
        want_tokens = ref_pack(docs, seq_len)
        want_spans = ref_spans(docs, seq_len)
        assert set(got) == set(want_tokens)
        for sid, (n, toks, spans) in got.items():
            assert (n, toks) == (len(want_tokens[sid]), want_tokens[sid]), sid
            assert spans == want_spans[sid], sid
            # spans tile the chunk exactly: contiguous, in order, full cover
            assert spans[0][1] == 0
            for (_, s1, l1), (_, s2, _) in zip(spans, spans[1:]):
                assert s1 + l1 == s2
            assert spans[-1][1] + spans[-1][2] == n


def test_pack_with_spans_empty_docs_skipped(spark):
    docs = [(1, []), (2, ["a", "b", "c"]), (3, []), (4, ["d"])]
    got = {
        r["seq_id"]: [(s["doc_id"], s["start"], s["len"]) for s in r["spans"]]
        for r in packing.pack_sequences_with_spans(_seg(spark, docs), 2).collect()
    }
    assert got == {0: [(2, 0, 2)], 1: [(2, 0, 1), (4, 1, 1)]}


def test_pack_empty_corpus(spark):
    """An empty corpus packs to an empty result — regression: the base
    offset map used to be built as an untyped zero-entry create_map(),
    which failed analysis."""
    empty = spark.createDataFrame([], "doc_id long, tokens array<string>")
    assert packing.pack_sequences(empty, 4).count() == 0
    assert packing.pack_sequences_with_spans(empty, 4).count() == 0
    only_empty_docs = spark.createDataFrame(
        [(1, []), (2, [])], "doc_id long, tokens array<string>"
    )
    assert packing.pack_sequences(only_empty_docs, 4).count() == 0
