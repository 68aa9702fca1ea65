"""Query inventory exposed through ``__spark_entry__``.

Each entry pairs a Spark DataFrame builder with an equivalent ANSI-SQL
oracle that DuckDB runs on the same parquet tables (the driver's
correctness gate, CORRECTNESS_r{N}.json). Import order matters only in
that the submodules register themselves on import.
"""

from tipoca_stream_spark.plans.registry import QUERIES, QueryDef, query

# registration side effects
from tipoca_stream_spark.plans import relational as _relational  # noqa: F401
from tipoca_stream_spark.plans import training as _training  # noqa: F401
from tipoca_stream_spark.plans import extended as _extended  # noqa: F401
from tipoca_stream_spark.plans import temporal_ops as _temporal_ops  # noqa: F401
from tipoca_stream_spark.plans import quality as _quality  # noqa: F401
from tipoca_stream_spark.plans import range_ops as _range_ops  # noqa: F401
from tipoca_stream_spark.plans import surface2 as _surface2  # noqa: F401
from tipoca_stream_spark.plans import clustering as _clustering  # noqa: F401
from tipoca_stream_spark.plans import timeseries as _timeseries  # noqa: F401
from tipoca_stream_spark.plans import sampling as _sampling  # noqa: F401
from tipoca_stream_spark.plans import tpch as _tpch  # noqa: F401
from tipoca_stream_spark.plans import textvec as _textvec  # noqa: F401
from tipoca_stream_spark.plans import mix as _mix  # noqa: F401
from tipoca_stream_spark.plans import analytics as _analytics  # noqa: F401
from tipoca_stream_spark.plans import graph as _graph  # noqa: F401
from tipoca_stream_spark.plans import mlstats as _mlstats  # noqa: F401
from tipoca_stream_spark.plans import pq as _pq  # noqa: F401

# --- driver correctness-panel order (round 12: rotation wave 2) --------------
# The driver's CORRECTNESS gate grades the FIRST 50 entries of QUERIES.
# Round 11's rotation gave 40 queries their first driver-side row (39 green;
# embed_quantize_int8 ERR'd on an unsortable array column, fixed this round
# and therefore KEPT in the panel so the fix gets a green r12 row). Wave 2
# rotates in the next never-graded tranche named by VERDICT r11 #2: the
# graph suite, the phrase/positional index family, SCD2, funnel/streak
# analytics, the r11 batch-vs-corpus screens and audio/video/text group-reps,
# perplexity buckets, the matryoshka/binary-hamming recall curves, the
# scalar/window/subquery suites, and heavy-hitter/HLL sketches. The
# reference-parity spine (CDC merge, masking, tombstones — the operators the
# reference's own loader exercises, pkg/redshiftloader/load_processor.go)
# stays in slots 1-10. Every name has an exact DuckDB oracle. Queries not
# listed keep their original relative order after the panel.
_PANEL = [
    # reference-parity spine (kept from the historical panel)
    "cdc_merge_lww",
    "m2_dedupe_latest",
    "m3_delete_common_anti",
    "m4_delete_op_filter",
    "a1_batch_event_counts",
    "s10_tombstone_skip",
    "mask_pipeline",
    "setop_union_distinct",
    "temporal_debezium_roundtrip",
    "dedup_semantic_flipped",
    # r11's one red row — fixed this round, re-graded to confirm
    "embed_quantize_int8",
    # graph suite (never driver-graded)
    "dedup_components",
    "graph_pagerank_supplier_part",
    "graph_triangle_counts",
    "graph_label_propagation",
    "graph_bfs_distances",
    "graph_kcore",
    "graph_clustering_coefficient",
    # phrase/positional index family
    "text_index_phrase_match",
    "text_index_phrase_incremental",
    # SCD2 + point-in-time
    "cdc_scd2_history",
    "join_scd2_pointintime",
    # funnel / streak / session analytics
    "events_funnel_counts",
    "events_activity_streaks",
    "events_session_window_native",
    # r11 batch-vs-corpus screens + remaining group-reps
    "multimodal_phash_screen",
    "multimodal_audio_screen",
    "multimodal_video_screen",
    "multimodal_audio_group_rep",
    "multimodal_video_group_rep",
    "dedup_simhash_group_rep",
    # text / embedding quality curves
    "text_perplexity_buckets",
    "embed_matryoshka_recall",
    "embed_binary_hamming_recall",
    # scalar / window / subquery suites
    "scalar_math_suite",
    "scalar_conditional_suite",
    "scalar_array_suite",
    "scalar_map_suite",
    "scalar_string_suite2",
    "scalar_date_suite2",
    "scalar_trycast_suite",
    "scalar_bitwise_suite",
    "window_frame_suite",
    "subquery_suite",
    "window_rolling_median",
    "window_first_last",
    "asof_nearest_view",
    # sketches / heavy hitters
    "agg_heavy_hitters",
    "agg_hll_sketch_rollup",
    # round-12 maintained fingerprint index: the batch screened against
    # the CAS-maintained band-bucketed index must equal the stateless
    # screen (compaction/vacuum/hard-link appends answer-invisible)
    "multimodal_phash_screen_maintained",
]


def _apply_panel_order() -> None:
    ordered = {n: QUERIES[n] for n in _PANEL if n in QUERIES}
    for name, qdef in QUERIES.items():
        if name not in ordered:
            ordered[name] = qdef
    QUERIES.clear()
    QUERIES.update(ordered)


_apply_panel_order()

__all__ = ["QUERIES", "QueryDef", "query", "_PANEL"]
