"""Unit tests for the corpus dedup / similarity / text operators (edges the
oracle harness can't hit with the synthetic corpus)."""

from __future__ import annotations

import pytest

from tipoca_stream_spark.operators import corpus_dedup as cd
from tipoca_stream_spark.operators import similarity as sim
from tipoca_stream_spark.operators import text as tx


@pytest.fixture()
def tiny(spark):
    return spark.createDataFrame(
        [(1, "single"), (2, "two words"), (3, "now three words here")],
        "doc_id long, text string",
    )


def test_shingles_short_docs_dont_crash(spark, tiny):
    # sequence(0, negative) is a DESCENDING sequence in Spark; the guard
    # must turn <n-word docs into zero shingles, not an index error
    rows = cd.word_shingles(tiny, "text", "doc_id").collect()
    assert {(r["doc_id"], r["shingle"]) for r in rows} == {
        (3, "now three words"), (3, "three words here"),
    }


def test_simhash_short_docs(spark, tiny):
    out = cd.simhash(tiny, "text", "doc_id").collect()
    assert [r["doc_id"] for r in out] == [3]  # featureless docs drop out


def test_simhash_bits_cap(spark, tiny):
    with pytest.raises(ValueError):
        cd.simhash(tiny, "text", "doc_id", bits=64)


def test_exact_dedup_counts(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], "doc_id long, text string"
    )
    rows = {r["keeper_id"]: r["n_copies"] for r in cd.exact_dedup_groups(df, "text", "doc_id").collect()}
    assert rows == {1: 2, 3: 1}


def test_lsh_pairs_identical_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "totally different words here now")],
        "doc_id long, text string",
    )
    sh = cd.word_shingles(df, "text", "doc_id")
    sig = cd.minhash_signatures(sh, "doc_id")
    bands = cd.lsh_band_keys(sig, "doc_id")
    pairs = {(r["id_a"], r["id_b"]) for r in cd.lsh_candidate_pairs(bands, "doc_id").collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_cosine_identical_and_orthogonal(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    top = sim.cosine_topk(df, 0, 2).collect()
    assert top[0]["vec_id"] == 1 and top[0]["sim"] == 1.0
    assert top[1]["vec_id"] == 2 and abs(top[1]["sim"]) < 1e-9


def test_langid_markers(spark):
    df = spark.createDataFrame(
        [(1, "the cat of the house"), (2, "der hund und die katze ist"), (3, "xyz qqq")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["lang_guess"] for r in tx.langid(df, "text", "doc_id").collect()}
    assert rows == {1: "en", 2: "de", 3: "und"}


def test_asof_join_edges(spark):
    from tipoca_stream_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100, "p1"), (1, 50, "p0"), (2, 10, "p2")], "uid long, ts long, tag string"
    )
    right = spark.createDataFrame(
        [(1, 50, "r-at-50"), (1, 99, "r-at-99"), (3, 5, "r-other")],
        "uid long, ts long, label string",
    )
    out = {r["tag"]: r["label_asof"] for r in
           asof_join(left, right, by=["uid"], left_ts="ts", right_ts="ts").collect()}
    assert out["p1"] == "r-at-99"  # latest prior
    assert out["p0"] == "r-at-50"  # equal timestamp is inclusive
    assert out["p2"] is None  # no right row in group → NULL


def test_rolling_hash_golden(spark):
    df = spark.createDataFrame([(1, "ab"), (2, ""), (3, "ba")], "doc_id long, text string")
    rows = {r["doc_id"]: r["rolling_hash"] for r in tx.rolling_hash(df, "text", "doc_id").collect()}
    assert rows[1] == (97 * 31 + 98) % 1_000_000_007  # 'a','b'
    assert rows[2] == 0  # empty text folds to seed
    assert rows[3] != rows[1]  # order-sensitive, unlike fingerprint()


def test_fingerprint_order_invariant(spark):
    df = spark.createDataFrame(
        [(1, "b a c"), (2, "c b a a"), (3, "a b d")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r["fingerprint"] for r in tx.fingerprint(df, "text", "doc_id").collect()}
    assert rows[1] == rows[2]  # same word set, different order/repeats
    assert rows[1] != rows[3]


def test_lsh_hot_bucket_cap_bounds_degenerate_bucket(spark):
    # 10k identical docs: every band bucket is one hot bucket; uncapped this
    # emits C(10k,2) ~ 50M pairs from one task. With the cap it completes
    # immediately, emits nothing, and the drop stats report what was cut.
    # (The in-plan observed metric can be swallowed by AQE empty-relation
    # propagation when the result is empty, hence the companion stats DF.)
    from pyspark.sql import functions as F

    from tipoca_stream_spark.operators import corpus_dedup as cd

    docs = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        F.lit("alpha beta gamma delta epsilon zeta").alias("text"),
    )
    shingled = cd.word_shingles(docs, "text", "doc_id", n=3)
    sigs = cd.minhash_signatures(shingled, "doc_id", n_hashes=4)
    bands = cd.lsh_band_keys(sigs, "doc_id", band_size=2).persist()

    pairs = cd.lsh_candidate_pairs(bands, "doc_id", max_bucket_size=100)
    assert pairs.count() == 0
    m = cd.lsh_bucket_drop_stats(bands, "doc_id", max_bucket_size=100).collect()[0]
    assert m["dropped_buckets"] == 2  # one hot bucket per band (4 hashes / 2)
    assert m["dropped_docs"] == 20_000
    bands.unpersist()


def test_lsh_cap_leaves_small_buckets_alone(spark):
    from pyspark.sql import functions as F

    from tipoca_stream_spark.operators import corpus_dedup as cd

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "totally different words here now")],
        "doc_id long, text string",
    )
    shingled = cd.word_shingles(docs, "text", "doc_id", n=3)
    sigs = cd.minhash_signatures(shingled, "doc_id", n_hashes=4)
    bands = cd.lsh_band_keys(sigs, "doc_id", band_size=2)
    capped = cd.lsh_candidate_pairs(bands, "doc_id", max_bucket_size=64).collect()
    uncapped = cd.lsh_candidate_pairs(bands, "doc_id").collect()
    assert sorted(map(tuple, capped)) == sorted(map(tuple, uncapped))
    assert (1, 2) in {(r["id_a"], r["id_b"]) for r in capped}


def test_gopher_quality_rules_golden(spark):
    from tipoca_stream_spark.operators import text as tx

    docs = spark.createDataFrame(
        [
            (1, "the cat sat of and is in good shape today"),  # passes all
            (2, "a b"),  # too few words
            (3, "### $$$ %%% ^^^ &&& *** @@@ !!! ~~~ +++"),  # symbols, no alpha
            (4, "the " + "supercalifragilisticexpialidocious " * 9),  # mean len
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in tx.gopher_quality(docs, "text", "doc_id").collect()}
    assert rows[1]["passes_gopher"] is True
    assert rows[2]["ok_word_count"] is False and rows[2]["passes_gopher"] is False
    assert rows[3]["ok_symbol_ratio"] is False and rows[3]["ok_alpha_words"] is False
    assert rows[4]["ok_mean_word_len"] is False


def test_repetition_scores_golden(spark):
    from tipoca_stream_spark.operators import text as tx

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),  # bigrams: ab ba ab ba ab -> top 'a b' 3/5
            (2, "u v w x y z"),  # all distinct
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in tx.repetition_scores(docs, "text", "doc_id").collect()}
    assert rows[1]["top_gram_fraction"] == pytest.approx(3 / 5)
    assert rows[1]["dup_word_fraction"] == pytest.approx(1 - 2 / 6)
    assert rows[2]["top_gram_fraction"] == pytest.approx(1 / 5)
    assert rows[2]["dup_word_fraction"] == 0.0


def test_contamination_scores_golden(spark):
    from pyspark.sql import functions as F

    from tipoca_stream_spark.operators import text as tx

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),  # benchmark doc
            (1, "alpha beta gamma something else entirely"),  # 1 shared trigram
            (2, "totally unrelated words right here now"),  # 0 shared
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in tx.contamination_scores(
        docs, "text", "doc_id", F.col("doc_id") == 0
    ).collect()}
    assert 0 not in out  # benchmark docs are not scored
    assert out[1]["n_contaminated"] == 1  # 'alpha beta gamma'
    assert out[1]["contamination_ratio"] == pytest.approx(1 / 4)
    assert out[2]["n_contaminated"] == 0 and out[2]["contamination_ratio"] == 0.0


def test_cooccurrence_hot_group_cap_bounds_degenerate_key(spark):
    # one "mega order" holding 20k distinct parts: uncapped this is
    # C(20k,2) ~ 200M pairs from ONE task. With the cap the group is
    # dropped (observed), normal-sized groups still pair.
    from pyspark.sql import functions as F
    from pyspark.sql import Observation

    from tipoca_stream_spark.plans.analytics import cooccurrence_pairs

    mega = spark.range(20_000).select(
        F.lit(1).alias("k"), F.col("id").alias("item")
    )
    normal = spark.createDataFrame(
        [(2, 10), (2, 11), (3, 10), (3, 11)], "k long, item long"
    )
    obs = Observation("coocc_drops")
    pairs = cooccurrence_pairs(
        mega.union(normal),
        key_col="k",
        item_col="item",
        min_count=2,
        max_group_size=256,
        observation=obs,
    ).collect()
    assert [(r["item_a"], r["item_b"]) for r in pairs] == [(10, 11)]
    assert obs.get["dropped_groups"] == 1
    assert obs.get["dropped_items"] == 20_000


def test_cooccurrence_cap_leaves_small_groups_alone(spark):
    from tipoca_stream_spark.plans.analytics import cooccurrence_pairs

    df = spark.createDataFrame(
        [(1, 5), (1, 6), (1, 7), (2, 5), (2, 6), (2, 6)], "k long, item long"
    )
    capped = cooccurrence_pairs(df, "k", "item", min_count=1, max_group_size=64).collect()
    uncapped = cooccurrence_pairs(df, "k", "item", min_count=1).collect()
    assert sorted(map(tuple, capped)) == sorted(map(tuple, uncapped))
    assert {(r["item_a"], r["item_b"], r["n_keys"]) for r in capped} == {
        (5, 6, 2), (5, 7, 1), (6, 7, 1)
    }


def test_simhash_group_rep_mega_group(spark):
    """The text twin of the round-11 group-rep scale pin: m docs sharing
    one signature cost O(m) rows (the pair shape would emit m(m-1)/2),
    and a within-threshold neighbor signature with a smaller min id
    becomes every member's representative."""
    rows = (
        [(i, 0b1111) for i in range(100, 600)]   # mega group, 500 members
        + [(5, 0b1110)]                          # hamming 1, global min id
        + [(7, 0b1010101010101010)]              # far signature, isolated
    )
    sig = spark.createDataFrame(rows, ["doc_id", "simhash"])
    out = cd.simhash_group_reps(sig, "doc_id", max_hamming=4).collect()
    assert len(out) == 502                       # one row per member
    by_id = {r["member_id"]: (r["rep_id"], r["hamming"]) for r in out}
    for i in range(100, 600):
        assert by_id[i] == (5, 1)
    assert by_id[5] == (5, 0)
    assert by_id[7] == (7, 0)
