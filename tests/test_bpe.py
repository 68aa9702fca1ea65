"""BPE tokenizer trainer/segmenter (operators/bpe.py).

Pins, against an independent inline reference implementation (the
plain-Counter full-recount Sennrich algorithm, no shared code):

- the delta-maintained local trainer path;
- the fully distributed trainer path (forced via collect_threshold=0);
- encode (lowest-rank-first) ≡ replay-merges-in-order on corpus words;
- determinism of tie-breaks, early stop, min_count pruning, and the
  overlap semantics of repeated symbols ("aaaa" → aa aa).
"""

from __future__ import annotations

import collections

import pytest

from pyspark.sql import functions as F

from tipoca_stream_spark.operators import bpe


def ref_train(texts, num_merges, min_count=1, min_pair_count=2):
    """Independent full-recount reference (Sennrich 2016, naive)."""
    vocab = collections.Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                vocab[w] += 1
    vocab = {w: c for w, c in vocab.items() if c >= min_count}
    syms = {w: tuple(list(w) + [bpe.END_OF_WORD]) for w in vocab}
    out = []
    for _ in range(num_merges):
        pc = collections.Counter()
        for w, c in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (left, right), cnt = best
        out.append((left, right, cnt))
        for w in vocab:
            s = syms[w]
            res, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    res.append(left + right)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            syms[w] = tuple(res)
    return out, {w: list(s) for w, s in syms.items()}


CORPORA = {
    "classic": [
        "low lower lowest low low",
        "newer newest new low wider wide",
        "low newer newer wide",
    ],
    "repeats": ["aaaa aaa aa baab", "aaaa abab aaaa", "bb aab aaaa"],
    "ties": ["ab cd ab cd", "cd ab", "ef ef gh gh"],
    "singletons": ["a b c a b", "x y z a", "q"],
}


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


@pytest.mark.parametrize("corpus", sorted(CORPORA))
def test_local_trainer_matches_reference(spark, corpus):
    texts = CORPORA[corpus]
    expected, _ = ref_train(texts, 10)
    got = bpe.train_bpe(_docs(spark, texts), num_merges=10)
    assert got == expected


def test_distributed_trainer_matches_reference(spark):
    texts = CORPORA["classic"]
    expected, _ = ref_train(texts, 6)
    got = bpe.train_bpe(_docs(spark, texts), num_merges=6, collect_threshold=0)
    assert got == expected


def test_repeated_symbol_overlap_semantics(spark):
    # left-to-right non-overlapping: "aaaa" + merge (a,a) -> [aa, aa, </w>],
    # then (aa,aa) may merge; never the overlapping [a,aa,a] reading.
    texts = ["aaaa aaaa aaaa aa"]
    expected, esyms = ref_train(texts, 4)
    got = bpe.train_bpe(_docs(spark, texts), num_merges=4)
    assert got == expected
    seg = bpe.segment_with_merges(_docs(spark, texts), got).collect()[0]
    want = []
    for w in texts[0].split(" "):
        want.extend(esyms[w])
    assert list(seg["tokens"]) == want


def test_early_stop_and_min_pair_count(spark):
    # every word unique, all pair counts 1 -> no merge reaches the floor
    got = bpe.train_bpe(_docs(spark, ["abc def ghi"]), num_merges=5)
    assert got == []
    # min_pair_count=1 merges greedily until single tokens remain
    got1 = bpe.train_bpe(
        _docs(spark, ["ab ab"]), num_merges=10, min_pair_count=1
    )
    expected1, _ = ref_train(["ab ab"], 10, min_pair_count=1)
    assert got1 == expected1
    assert got1[-1][0] + got1[-1][1] == "ab" + bpe.END_OF_WORD


def test_min_count_prunes_vocab(spark):
    texts = ["low low low", "onceword"]
    expected, _ = ref_train(texts, 5, min_count=2)
    got = bpe.train_bpe(_docs(spark, texts), num_merges=5, min_count=2)
    assert got == expected
    assert all("once" not in l + r for l, r, _ in got)


@pytest.mark.parametrize("corpus", sorted(CORPORA))
def test_encode_equals_replay_on_corpus_words(spark, corpus):
    """The segmenter's lowest-rank-first encode must reproduce the
    trainer's final symbol table for every corpus word."""
    texts = CORPORA[corpus]
    merges, esyms = ref_train(texts, 10)
    words = sorted(esyms)
    seg = bpe.segment_with_merges(
        spark.createDataFrame([(w, w) for w in words], ["doc_id", "text"]),
        merges,
    ).collect()
    got = {r["doc_id"]: list(r["tokens"]) for r in seg}
    assert got == esyms


def test_segment_empty_and_multispace(spark):
    merges = [("a", "b", 2)]
    rows = (
        bpe.segment_with_merges(
            spark.createDataFrame(
                [(1, "ab  ab"), (2, ""), (3, " ")], ["doc_id", "text"]
            ),
            merges,
        )
        .orderBy("doc_id")
        .collect()
    )
    assert list(rows[0]["tokens"]) == ["ab", "</w>", "ab", "</w>"]
    assert list(rows[1]["tokens"]) == []
    assert list(rows[2]["tokens"]) == []


def test_word_frequencies_plan_is_aggregate_pushdown(spark):
    """The corpus-sized stage must be a partial-aggregate shuffle (map-side
    combine), not a raw-word shuffle."""
    df = bpe.word_frequencies(
        _docs(spark, CORPORA["classic"]), min_count=2
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_token_vocabulary_order_and_ids(spark):
    docs = _docs(spark, CORPORA["classic"])
    merges = bpe.train_bpe(docs, num_merges=8)
    seg = bpe.segment_with_merges(docs, merges)
    vocab = bpe.token_vocabulary(seg).orderBy("token_id").collect()
    # dense ids from 0
    assert [r["token_id"] for r in vocab] == list(range(len(vocab)))
    # deterministic order: freq desc, token asc
    keys = [(-r["freq"], r["token"]) for r in vocab]
    assert keys == sorted(keys)
    # freqs equal the segmented corpus counts
    counts = collections.Counter(
        t for r in seg.collect() for t in r["tokens"]
    )
    assert {r["token"]: r["freq"] for r in vocab} == dict(counts)
    # the vocabulary is tokenizer-spec-bounded: every token is an initial
    # symbol or one merge's output
    allowed = {l + r for l, r, _ in merges} | {bpe.END_OF_WORD}
    allowed |= {c for r in vocab for c in r["token"]}
    assert all(r["token"] in allowed for r in vocab)


def test_tokens_to_ids_roundtrip_and_unknown(spark):
    docs = _docs(spark, CORPORA["classic"])
    merges = bpe.train_bpe(docs, num_merges=8)
    seg = bpe.segment_with_merges(docs, merges)
    vocab_rows = bpe.token_vocabulary(seg).collect()
    inv = {r["token_id"]: r["token"] for r in vocab_rows}
    ids = {
        r["doc_id"]: list(r["ids"])
        for r in bpe.tokens_to_ids(seg, bpe.token_vocabulary(seg)).collect()
    }
    toks = {r["doc_id"]: list(r["tokens"]) for r in seg.collect()}
    assert set(ids) == set(toks)
    for d, idlist in ids.items():
        assert [inv[i] for i in idlist] == toks[d], d
    # dict-vocab path + unknown token -> -1
    other = spark.createDataFrame([(9, ["zzz", "low"])], ["doc_id", "tokens"])
    got = bpe.tokens_to_ids(other, {"low": 5}).collect()[0]
    assert list(got["ids"]) == [-1, 5]


def test_segment_roundtrip_lossless(spark):
    """Detokenization invariant: concatenating a document's tokens and
    replacing the </w> markers with spaces reproduces the NORMALIZED
    text (single-space-joined non-empty words) for every doc — the
    tokenizer is lossless, so a trainer can always recover the text."""
    texts = [t for c in CORPORA.values() for t in c] + ["", " ", "a  b c"]
    docs = spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    merges = bpe.train_bpe(docs, num_merges=12)
    seg = bpe.segment_with_merges(docs, merges)
    got = {r["doc_id"]: list(r["tokens"]) for r in seg.collect()}
    for i, t in enumerate(texts):
        toks = got[i + 1]
        detok = "".join(toks).replace(bpe.END_OF_WORD, " ").rstrip(" ")
        normalized = " ".join(w for w in t.split(" ") if w)
        assert detok == normalized, (i + 1, t, toks)
    # and through the id layer: ids -> tokens -> text survives unchanged
    vocab_rows = bpe.token_vocabulary(seg).collect()
    inv = {r["token_id"]: r["token"] for r in vocab_rows}
    ids = {r["doc_id"]: list(r["ids"])
           for r in bpe.tokens_to_ids(seg, bpe.token_vocabulary(seg)).collect()}
    for i, t in enumerate(texts):
        detok = "".join(inv[x] for x in ids[i + 1]).replace(
            bpe.END_OF_WORD, " ").rstrip(" ")
        assert detok == " ".join(w for w in t.split(" ") if w), (i + 1, t)
