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

# --- driver correctness-panel order (round 13: rotation wave 3) --------------
# The driver's CORRECTNESS gate grades the FIRST 50 entries of QUERIES.
# Waves 1-2 (rounds 11-12) gave 143 of the 235 registered queries a
# driver-side row; wave 3 rotates in the next 40 never-graded queries named
# by VERDICT r12 #1: the BPE/packing family, mixture/epoch ops, the dq_*
# drift/FK gates, the TPC-H remainder (q2/q4/q5/q7/q10-q16/q18-q20/q22),
# text bigram-PMI/vocab-coverage/Zipf, events histogram/gap-fill/markov, and
# the round-12 additions (contamination screen, hybrid RRF, cluster sizes,
# audio/video maintained screens). The reference-parity spine (CDC merge,
# masking, tombstones — the operators the reference's own loader exercises,
# pkg/redshiftloader/load_processor.go) stays in slots 1-10. Every name has
# an exact DuckDB oracle; all 40 were pre-validated at round-12 close under
# the driver's exact pandas canon (scripts/verify_panel.py) and re-verified
# before this commit. Queries not listed keep their original relative order
# after the panel.
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
    # BPE / packing family (never driver-graded)
    "bpe_token_freq",
    "bpe_doc_token_counts",
    "bpe_encode_ids",
    "bpe_pack_sequences",
    "bpe_fertility_by_lang",
    "pack_doc_spans",
    # mixture / epoch ops
    "mixture_temperature_sample",
    "mixture_epoch_totals",
    "corpus_mix_weights",
    # dq_* drift + FK gates
    "dq_psi_drift",
    "dq_chisq_drift",
    "dq_orders_gate",
    "dq_orders_fk_gate",
    "dq_fk_matrix",
    # TPC-H remainder
    "tpch_q2_min_cost_supplier",
    "tpch_q4_priority_late_ship",
    "tpch_q5_local_supplier",
    "tpch_q7_volume_shipping",
    "tpch_q10_returned_items",
    "tpch_q11_important_parts",
    "tpch_q12_priority_by_returnflag",
    "tpch_q13_order_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_variety",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive_revenue",
    "tpch_q20_promo_suppliers",
    "tpch_q22_global_sales",
    # text statistics
    "text_bigram_pmi",
    "text_vocab_coverage",
    "text_zipf_slope",
    # events histogram / gap-fill / markov
    "events_value_histogram",
    "events_gapfill_locf",
    "events_markov_transitions",
    # round-12 additions
    "corpus_contamination_screen",
    "retrieval_hybrid_rrf",
    "multimodal_phash_cluster_sizes",
    "multimodal_audio_screen_maintained",
    "multimodal_video_screen_maintained",
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
