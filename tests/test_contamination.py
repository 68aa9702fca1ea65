"""contamination_screen: brute-force randomized parity (the operator's
shared/total distinct-n-gram counts must equal a pure-Python replay on
random small corpora), plus the edge cases a curation gate hits —
short documents, no-overlap documents, n-gram width changes."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from tipoca_stream_spark.operators.contamination import contamination_screen

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _brute(train_rows, test_rows, n):
    def shingles(text):
        w = text.split(" ")
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)} if len(w) >= n else set()

    te = set()
    for _, t in test_rows:
        te |= shingles(t)
    out = {}
    for did, t in train_rows:
        sh = shingles(t)
        shared = len(sh & te)
        if shared:
            out[did] = (shared, len(sh), round(shared / len(sh), 6))
    return out


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_randomized_parity_with_brute_force(spark):
    rng = random.Random(12)
    for trial in range(3):
        train = [
            (i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 12))))
            for i in range(20)
        ]
        test = [
            (100 + i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 12))))
            for i in range(5)
        ]
        n = rng.choice([2, 3])
        got = {
            r["doc_id"]: (r["shared_ngrams"], r["total_ngrams"], r["contamination"])
            for r in contamination_screen(
                _df(spark, train), _df(spark, test), n=n
            ).collect()
        }
        assert got == _brute(train, test, n), f"trial {trial} n={n}"


def test_short_docs_produce_no_shingles(spark):
    # train doc shorter than n words can never be flagged; a short TEST
    # doc contributes nothing
    train = [(1, "alpha beta"), (2, "alpha beta gamma delta")]
    test = [(9, "alpha"), (10, "alpha beta gamma")]
    got = {r["doc_id"] for r in contamination_screen(
        _df(spark, train), _df(spark, test), n=3).collect()}
    assert got == {2}


def test_clean_docs_absent_and_fully_contained_doc_scores_one(spark):
    train = [(1, "alpha beta gamma delta"), (2, "zeta eta theta zeta")]
    test = [(9, "alpha beta gamma delta eps")]
    rows = {r["doc_id"]: r for r in contamination_screen(
        _df(spark, train), _df(spark, test), n=4).collect()}
    assert set(rows) == {1}
    assert rows[1]["shared_ngrams"] == 1 and rows[1]["total_ngrams"] == 1
    assert rows[1]["contamination"] == 1.0


def test_fingerprint_index_randomized_chain(spark, tmp_path):
    """Randomized epochs (fresh draws + exact copies + 1-bit flips of
    earlier fingerprints) through the dedup ingest must equal the
    stateless acceptance-chain replay."""
    from tipoca_stream_spark.operators.incremental_fingerprint import (
        IncrementalFingerprintIndex,
    )
    from tipoca_stream_spark.operators.phash import phash_screen

    rng = random.Random(34)

    def rand_fp():
        return "".join(rng.choice("01") for _ in range(64))

    def flip1(fp):
        i = rng.randrange(64)
        return fp[:i] + ("1" if fp[i] == "0" else "0") + fp[i + 1:]

    pool: list[str] = []
    epochs = []
    nid = 0
    for _ in range(4):
        rows = []
        for _ in range(15):
            r = rng.random()
            if pool and r < 0.3:
                fp = rng.choice(pool)          # exact dup
            elif pool and r < 0.5:
                fp = flip1(rng.choice(pool))   # near dup (hamming 1)
            else:
                fp = rand_fp()                 # novel (~32 bits away w.h.p.)
            pool.append(fp)
            rows.append((nid, fp))
            nid += 1
        epochs.append(rows)

    def df(rows):
        return spark.createDataFrame(rows, ["media_id", "phash"]).withColumn(
            "media_id", F.col("media_id").cast("long")
        )

    idx = IncrementalFingerprintIndex(spark, str(tmp_path))
    got = []
    for ep in epochs:
        _, m = idx.ingest(df(ep), dedup=True)
        got.append(sorted((r["member_id"], r["dup_of"], r["hamming"])
                          for r in m.collect()))

    # epoch 0 bootstraps: ingest() on an empty index accepts everything
    accepted = df(epochs[0])
    want = [[]]
    for ep in epochs[1:]:
        batch = df(ep)
        m = phash_screen(batch, accepted, max_hamming=8)
        want.append(sorted((r["member_id"], r["dup_of"], r["hamming"])
                           for r in m.collect()))
        fl = m.select(F.col("member_id").alias("media_id")).distinct()
        accepted = accepted.unionByName(batch.join(fl, "media_id", "left_anti"))
    assert got == want
