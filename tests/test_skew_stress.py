"""Hot-key skew stress (round-5, VERDICT r4 #5): one key owning ~10% of all
rows through the merge, MinHash-LSH, and co-occurrence paths — the caps and
map-side combines keep tasks bounded, and every engaged cap is OBSERVED,
never silent."""

from __future__ import annotations

import time

from pyspark.sql import Observation
from pyspark.sql import functions as F

from tipoca_stream_spark.operators.corpus_dedup import (
    lsh_band_keys,
    lsh_bucket_drop_stats,
    lsh_candidate_pairs,
    minhash_signatures,
    word_shingles,
)
from tipoca_stream_spark.operators.merge import merge_into_target
from tipoca_stream_spark.plans.analytics import cooccurrence_pairs
from tipoca_stream_spark.plans.relational import _events_as_cdc
from tipoca_stream_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"
HOT = 42


def _skewed_cdc(spark):
    """events-as-CDC with ~10% of rows remapped onto one user_id."""
    cdc = _events_as_cdc(spark, SF)
    return cdc.withColumn(
        "user_id",
        F.when(F.col("user_id") % 10 == 0, F.lit(HOT)).otherwise(F.col("user_id")),
    )


def test_cdc_merge_hot_key_correct_and_bounded(spark):
    batch = _skewed_cdc(spark)
    n_hot = batch.filter(F.col("user_id") == HOT).count()
    total = batch.count()
    assert n_hot >= total // 20, "fixture must be genuinely skewed"
    target = spark.createDataFrame([], "user_id long, event_type string, value double")
    t0 = time.perf_counter()
    merged = merge_into_target(target, batch, ["user_id"]).collect()
    dt = time.perf_counter() - t0
    # latest-wins collapses the hot key map-side (max_by partial agg):
    # exactly one surviving row for HOT unless its winner is a delete
    by_key = {r["user_id"]: r for r in merged}
    assert len(merged) == len(by_key)
    winner = (
        batch.filter(F.col("user_id") == HOT)
        .orderBy(F.col("kafkaoffset").desc())
        .first()
    )
    if winner["debeziumop"] == "DELETE":
        assert HOT not in by_key
    else:
        assert by_key[HOT]["value"] == winner["value"]
    assert dt < 60, f"hot-key merge took {dt:.1f}s"


def test_minhash_hot_bucket_cap_engages_and_is_observed(spark):
    docs = load_table(spark, SF, "documents")
    boiler = "the quick brown fox jumps over the lazy dog again and again forever"
    skewed = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 10 == 0, F.lit(boiler)).otherwise(F.col("text")),
    )
    n_hot = skewed.filter(F.col("text") == boiler).count()
    assert n_hot >= 40
    bands = lsh_band_keys(
        minhash_signatures(word_shingles(skewed, "text", "doc_id"), "doc_id"),
        "doc_id",
    )
    cap = 32
    pairs = lsh_candidate_pairs(bands, "doc_id", max_bucket_size=cap)
    n_pairs = pairs.count()
    # without the cap the boilerplate bucket alone emits C(n_hot, 2) pairs
    # from one task; with it, that bucket is dropped entirely
    assert n_pairs < n_hot * (n_hot - 1) // 2
    stats = lsh_bucket_drop_stats(bands, "doc_id", cap).collect()[0]
    assert stats["dropped_buckets"] >= 1
    assert stats["dropped_docs"] >= n_hot


def test_cooccurrence_hot_group_cap_engages_and_is_observed(spark):
    li = load_table(spark, SF, "lineitem")
    skewed = li.withColumn(
        "l_orderkey",
        F.when(F.col("l_orderkey") % 10 == 0, F.lit(1)).otherwise(F.col("l_orderkey")),
    )
    hot_items = (
        skewed.filter(F.col("l_orderkey") == 1).select("l_partkey").distinct().count()
    )
    assert hot_items > 256, "hot basket must exceed the cap"
    obs = Observation("skew_drops")
    pairs = cooccurrence_pairs(
        skewed,
        key_col="l_orderkey",
        item_col="l_partkey",
        min_count=2,
        max_group_size=256,
        observation=obs,
    )
    n = pairs.count()  # completes without a C(hot_items, 2) task
    assert n >= 0
    assert obs.get["dropped_groups"] >= 1
    assert obs.get["dropped_items"] >= hot_items


def test_dup_spans_universal_boilerplate_gram(spark):
    """A 5-gram present in EVERY document (universal boilerplate) is the
    dup-span hot key: all its position rows share one gram key. The
    count-distinct dup pass must two-phase it (map-side partial sets)
    and the per-doc island merge must stay doc-keyed — completes with
    the correct per-doc span for every document."""
    from tipoca_stream_spark.plans.quality import dup_spans

    boiler = "one two three four five"
    docs = spark.createDataFrame(
        [(i, f"u{i}a u{i}b {boiler} u{i}c u{i}d") for i in range(2000)],
        "doc_id long, text string",
    ).repartition(16)
    t0 = time.time()
    rows = dup_spans(docs).collect()
    assert time.time() - t0 < 120
    assert len(rows) == 2000  # one span per doc: the planted block
    assert all(
        (r["span_start"], r["span_end"], r["n_windows"]) == (3, 7, 1) for r in rows
    )


def test_heavy_hitters_one_item_owns_half_the_rows(spark):
    """One item = 50% of all rows: locally heavy in EVERY partition, so
    the candidate pass emits it from each — candidates stay tiny and the
    verify exchange carries (partitions x candidates) combined rows, not
    the raw hot rows (map-side count combine)."""
    from tipoca_stream_spark.operators.heavyhitters import heavy_hitters

    n = 40000
    df = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(7)).otherwise(F.col("id")).alias("item")
    ).repartition(16)
    got = {r["item"]: r["cnt"] for r in heavy_hitters(df, "item", k=3).collect()}
    # n/2 evens remapped to 7, plus the odd id=7 row itself
    assert got == {7: n // 2 + 1}  # only the hot item clears n/3


def test_bfs_hub_node_frontier(spark):
    """A hub adjacent to every other node: the first expansion's frontier
    is the whole graph. distinct() + anti-join keep the frontier a node
    SET (never multiplied by hub degree), so hop 2 sees an empty
    frontier and the loop exits early with all distances = 1."""
    from tipoca_stream_spark.operators.bfs import bfs_distances

    n = 5000
    edges = spark.range(1, n).select(
        F.lit(0).alias("src"), F.col("id").alias("dst")
    ).union(
        spark.range(1, n).select(F.col("id").alias("src"), F.lit(0).alias("dst"))
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = bfs_distances(edges, seeds, max_hops=4)
    by_dist = {r["dist"]: r["n"] for r in got.groupBy("dist").agg(F.count("*").alias("n")).collect()}
    assert by_dist == {0: 1, 1: n - 1}
