"""Physical-plan regression tests: the properties SCALE.md claims are
pinned here so a refactor can't silently de-optimize a hot path — the
100 TB story depends on these shapes, not just on correct results."""

from __future__ import annotations

import contextlib
import io

import pytest

from tipoca_stream_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = QUERIES[name].fn(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# every relational/corpus query must stay fully JVM-side — a Python eval
# node in one of these is a 10-100x regression at scale
NO_PYTHON = [
    "cdc_merge_lww",
    "mask_pipeline",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "similarity_cosine_topk",
    "text_quality_scores",
    "join_revenue_by_nation",
    "agg_cube_lineitem",
    "timeseries_profile_similarity",
]


@pytest.mark.parametrize("name", NO_PYTHON)
def test_no_python_eval_in_hot_path(spark, name):
    plan = plan_of(spark, name)
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        assert node not in plan, f"{name}: {node} in physical plan"


def test_star_join_broadcasts_dims(spark):
    plan = plan_of(spark, "join_revenue_by_nation")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must never sort-merge


def test_topk_uses_take_ordered(spark):
    plan = plan_of(spark, "topn_orders")
    assert "TakeOrderedAndProject" in plan  # never a global sort


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(spark, "topk_unshipped_revenue")
    assert "PushedFilters: [" in plan
    # at least one scan carries a non-empty pushed filter list
    pushed = [
        seg.split("]", 1)[0]
        for seg in plan.split("PushedFilters: [")[1:]
    ]
    assert any(p.strip() for p in pushed), "no filter reached any parquet scan"


def test_scan_prunes_columns(spark):
    plan = plan_of(spark, "m2_dedupe_latest")
    # events has 5 columns; the dedupe needs exactly 4
    for seg in plan.split("ReadSchema: struct<")[1:]:
        cols = seg.split(">", 1)[0].split(",")
        assert len(cols) <= 4, f"scan reads {len(cols)} columns, expected <=4"


def test_range_join_broadcasts_band_table(spark):
    plan = plan_of(spark, "join_range_value_tiers")
    assert "BroadcastNestedLoopJoin" in plan


def test_multimodal_is_arrow_batched(spark):
    # the one place Python is allowed must be Arrow-batched mapInPandas,
    # never row-at-a-time BatchEvalPython
    plan = plan_of(spark, "multimodal_features")
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


@pytest.mark.parametrize(
    "name",
    ["dedup_simhash_pairs", "similarity_neardup_pairs",
     "multimodal_phash_near_dup", "multimodal_audio_near_dup",
     "multimodal_video_near_dup",
     "multimodal_phash_group_rep", "multimodal_audio_group_rep",
     "multimodal_video_group_rep", "dedup_simhash_group_rep",
     "multimodal_phash_screen", "multimodal_audio_screen",
     "multimodal_video_screen"],
)
def test_pair_queries_have_no_cartesian(spark, name):
    # near-dup pair generation must be banded candidate equi-joins, never an
    # all-pairs product: O(n^2) rows at 1B docs is 10^18 pairs
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    assert "BroadcastNestedLoopJoin" not in plan, f"{name}: BNLJ in plan"


TPCH = [n for n in QUERIES if n.startswith("tpch_")]


@pytest.mark.parametrize("name", sorted(TPCH))
def test_tpch_no_cartesian_or_python(spark, name):
    # the whole family must stay JVM-side with no unconditioned big joins;
    # the only BNLJ allowed is a 1-row scalar-subquery broadcast (q11/q22)
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan


def test_tpch_q9_star_all_broadcast(spark):
    # 4-way star: every dim (part/supplier/nation) broadcasts; the fact
    # shuffles only for its one big-big join and final group
    plan = plan_of(spark, "tpch_q9_product_profit")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_tpch_q10_take_ordered_top20(spark):
    plan = plan_of(spark, "tpch_q10_returned_items")
    assert "TakeOrderedAndProject" in plan  # LIMIT 20 never global-sorts


def test_tpch_q14_month_filter_pushed(spark):
    plan = plan_of(spark, "tpch_q14_promo_revenue")
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    pushed = [seg.split("]", 1)[0] for seg in plan.split("PushedFilters: [")[1:]]
    assert any("l_shipdate" in p for p in pushed), "ship-month filter not pushed to scan"


def test_tpch_q4_exists_becomes_semi_join(spark):
    # Catalyst must decorrelate EXISTS into a join, not a per-row subquery
    plan = plan_of(spark, "tpch_q4_priority_late_ship")
    assert "Join LeftSemi" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


NEW_FAMILIES = [
    "text_tfidf_topterms",
    "text_bigram_pmi",
    "text_vocab_coverage",
    "similarity_batch_topk",
    "embed_quantize_int8",
    "corpus_stratified_sample",
    "dedup_canonical_docs",
    "corpus_shard_stats",
    "events_funnel_counts",
    "events_retention_cohorts",
    "events_activity_streaks",
    "events_salted_counts",
    "cdc_scd2_history",
    "dq_orders_gate",
    "dq_orders_fk_gate",
    "events_click_to_purchase",
    "events_moving_avg_1h",
    "feature_quantile_bins",
    "agg_string_concat",
    "scalar_trycast_suite",
]


@pytest.mark.parametrize("name", NEW_FAMILIES)
def test_new_families_stay_jvm_side(spark, name):
    # no Python eval nodes, no cartesian products anywhere; the only BNLJ
    # allowed is a 1-row scalar/total broadcast or a bounded query-set
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, f"{name}: {node} in plan"


def test_triangles_no_cartesian_jvm_side_take_ordered(spark):
    # wedge + closing joins must both be equi-joins (hash/sort-merge),
    # never a cartesian; top-20 is TakeOrderedAndProject; all JVM-side
    plan = plan_of(spark, "graph_triangle_counts")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan


def test_bm25_take_ordered_and_jvm_side(spark):
    # global top-k must be TakeOrderedAndProject (never a full sort) and
    # the whole scoring pipeline stays JVM-side
    plan = plan_of(spark, "text_bm25_retrieval")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan


def test_quantize_has_no_exchange(spark):
    # narrow projection: zero shuffles at any scale
    plan = plan_of(spark, "embed_quantize_int8")
    assert "Exchange" not in plan


@pytest.mark.parametrize(
    "name",
    [
        "corpus_stratified_sample",
        "window_topk_orders_per_customer",
        "text_tfidf_topterms",
        "similarity_batch_topk",
    ],
)
def test_window_topk_gets_group_limit(spark, name):
    # rank-filter top-k must trigger WindowGroupLimit: a per-partition
    # partial top-k heap BEFORE the shuffle, so only ~k rows per group
    # move — this is what makes per-stratum sampling safe when one
    # stratum is a whole language at 100 TB
    plan = plan_of(spark, name)
    assert "WindowGroupLimit" in plan, f"{name}: window group-limit not applied"


def test_chunk_windows_has_no_exchange(spark):
    # sequence/posexplode/slice chunking is a narrow per-row transform
    plan = plan_of(spark, "corpus_chunk_windows")
    assert "Exchange" not in plan


def test_pagerank_iterations_are_keyed_joins(spark):
    # every round must be hash joins + hash aggregates on node ids —
    # never a cartesian/BNLJ, never Python
    plan = plan_of(spark, "graph_pagerank_supplier_part")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan


def test_cooccurrence_is_single_shuffle_group_expansion(spark):
    # pair expansion is bucket-local (group by l_orderkey, expand the
    # in-group item array) — never a cross join, never a second scan for
    # a self-join branch
    plan = plan_of(spark, "analytics_part_cooccurrence")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" not in plan  # group-expansion form has no join at all


def test_unigram_logprob_broadcasts_vocab(spark):
    # the vocab-probability join must broadcast the vocab side; the doc
    # token stream must never sort-merge on the token
    plan = plan_of(spark, "text_unigram_logprob")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


THIRD_SESSION_JVM = [
    "agg_corr_matrix",
    "ml_linreg_by_group",
    "events_anomaly_mad",
    "text_dup_spans",
    "graph_bfs_distances",
    "similarity_pq_codes",
]


@pytest.mark.parametrize("name", THIRD_SESSION_JVM)
def test_third_session_queries_stay_jvm_side(spark, name):
    # (agg_heavy_hitters is the deliberate exception: its candidate pass
    # IS an Arrow mapInPandas — its shape pin lives in
    # test_heavyhitters_bfs.py asserting the broadcast semi-join verify)
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, f"{name}: {node} in plan"


def test_pq_encode_has_no_exchange(spark):
    # PQ encoding is a narrow projection (slice + zip_with + argmin
    # chain): zero shuffles at any scale, like embed_quantize_int8
    plan = plan_of(spark, "similarity_pq_codes")
    assert "Exchange" not in plan


def test_pq_adc_take_ordered_single_lut_broadcast(spark):
    # ADC ranking must be TakeOrderedAndProject over a map-only scan; the
    # only wide-to-narrow join is the broadcast of the 1-row query LUT
    plan = plan_of(spark, "similarity_pq_adc_topk")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan


def test_ivfpq_take_ordered_broadcast_only(spark):
    # the combined index must keep PQ's map-only ADC shape: broadcast
    # cell-candidate + LUT joins, TakeOrderedAndProject ranking, no
    # cartesian, all JVM-side
    plan = plan_of(spark, "similarity_ivfpq_topk")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan


def test_phrase_match_pushes_term_filters_no_cartesian(spark):
    """The positional-index phrase query (round 6) must stay pushed +
    keyed: term equality reaches the posting parquet scans (file and
    row-group pruning via the build-time term sort) and the position
    joins are (doc_id, pos)-keyed — never a CartesianProduct, never a
    Python eval node."""
    plan = plan_of(spark, "text_index_phrase_match")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "Python" not in plan or "ArrowEvalPython" not in plan
    pushed = [
        seg.split("]")[0] for seg in plan.split("PushedFilters: [")[1:]
    ]
    assert any("term" in p for p in pushed), "term filter did not reach the posting scan"


# --- round-8 additions: curation/packing family ------------------------------

def test_harmonic_pack_no_single_partition(spark):
    # one size class can hold most of the corpus; the packer's ranks are
    # hierarchical, so the plan must never funnel through one partition
    plan = plan_of(spark, "pack_bins_harmonic")
    assert "SinglePartition" not in plan, plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan


def test_dsir_topk_uses_take_ordered(spark):
    # corpus-wide selection must be a distributed partial top-K; the only
    # single-partition stage allowed is the rank window over the K
    # survivors (bounded at DSIR_SELECT_K rows by the preceding limit)
    plan = plan_of(spark, "corpus_dsir_select")
    assert "TakeOrderedAndProject" in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan


def test_matryoshka_recall_take_ordered_no_python(spark):
    plan = plan_of(spark, "embed_matryoshka_recall")
    assert "TakeOrderedAndProject" in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan


def test_nb_filter_broadcasts_vocab_no_python(spark):
    # the per-token log-ratio table is vocabulary-sized: the score join
    # must be broadcast, never a shuffle of the corpus token stream
    plan = plan_of(spark, "text_nb_quality_filter")
    assert "BroadcastHashJoin" in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan


def test_calibration_broadcasts_cutoffs_no_python(spark):
    # per-source decile cutoffs are a sources×9 array table: the
    # assignment join must broadcast it, never shuffle the scored corpus
    plan = plan_of(spark, "quality_calibration_by_source")
    assert "BroadcastHashJoin" in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan


def test_shuffle_order_no_global_sort(spark):
    # the epoch shuffle ranks WITHIN shards only — a global ordering
    # would be an Exchange SinglePartition over the corpus
    plan = plan_of(spark, "corpus_shuffle_order")
    assert "SinglePartition" not in plan, plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan


def test_contamination_broadcasts_benchmark_side(spark):
    # the held-out benchmark shingle set must BROADCAST (at 100 TB the
    # train side streams through it — a train-side shuffle for candidate
    # generation would be the scale-killer); all JVM-side, no cartesian
    plan = plan_of(spark, "corpus_contamination_screen")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan


def test_hybrid_rrf_jvm_side_no_cartesian(spark):
    # both legs top-k first; the only BNLJ allowed is the documented
    # 1-row totals / 1-row query-vector broadcast
    plan = plan_of(spark, "retrieval_hybrid_rrf")
    assert "CartesianProduct" not in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan


def test_keep_best_quality_single_group_window_jvm_side(spark):
    # one fingerprint-keyed exchange feeding the group-local window; no
    # cartesian, no Python eval — the group-rep shape (O(groups) output)
    plan = plan_of(spark, "dedup_keep_best_quality")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan
    assert "Window" in plan


def test_ngram_novelty_jvm_side_no_cartesian(spark):
    # shingle-keyed min + doc-keyed aggregate; the join back is a keyed
    # equi-join (AQE may pick broadcast or SMJ) — never a cartesian, and
    # no corpus-wide window
    plan = plan_of(spark, "text_ngram_novelty")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan
