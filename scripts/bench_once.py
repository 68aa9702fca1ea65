"""One timed pass over the 18 HEADLINE bench queries — the unit of the
quiet-host A/B (scripts/bench_ab.py). Imports tipoca_stream_spark from
$PYTHONPATH/cwd, so the SAME script measures any checkout; prints one
tagged JSON line. Single-shot per query by design: the orchestrator
interleaves whole processes and takes min-of-N across them, which also
randomizes JVM/JIT state across sides instead of pinning it to one."""

from __future__ import annotations

import json
import os
import time

HEADLINE = [
    "cdc_merge_lww",
    "m2_dedupe_latest",
    "mask_pipeline",
    "agg_pricing_summary",
    "agg_cube_lineitem",
    "join_revenue_by_nation",
    "window_topk_orders_per_customer",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "similarity_cosine_topk",
    "similarity_lsh_buckets",
    "similarity_ivf_topk",
    "topk_unshipped_revenue",
    "window_rank_suite",
    "text_quality_scores",
    "text_fingerprint",
    "events_windowed_agg",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # BENCH_AB_FORCING=noop forces every query through a materializing
    # noop sink instead of count() (VERDICT r9 next #6: a bare count lets
    # Catalyst elide computed columns nothing consumes — projection-only
    # queries measure 2-5x light). Default stays count so ratios against
    # pre-r10 checkouts remain valid; both sides of an A/B always get the
    # same forcing because this one script serves both.
    forcing = os.environ.get("BENCH_AB_FORCING", "count")
    from tipoca_stream_spark.plans import QUERIES
    from tipoca_stream_spark.session import get_spark

    spark = get_spark("bench_ab_once")

    def force(df) -> None:
        if forcing == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    # same warmup discipline as bench.py: JVM/codegen + parquet footers
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    for warm in ("m2_dedupe_latest", "agg_pricing_summary"):
        force(QUERIES[warm].fn(spark, sf_dir))

    out: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        force(QUERIES[name].fn(spark, sf_dir))
        out[name] = round(time.perf_counter() - t0, 3)

    # top-cost EXTRAS (VERDICT r7 wrong #4: cross-round claims about the
    # extras — pagerank/triangles/components/tpch — had no A/B standard;
    # r7's graph_pagerank read +141% on host load with no adjudication
    # path). Same single-shot-per-process discipline as the headline.
    extras = {
        "x_graph_pagerank": "graph_pagerank_supplier_part",
        "x_graph_triangles": "graph_triangle_counts",
        "x_dedup_components": "dedup_components",
        "x_dedup_semantic": "dedup_semantic",
    }
    # round-8 additions — in every checkout from r8-close on, so the r9
    # A/B can adjudicate them; skipped silently when the A side predates
    # them (cross-round totals compare only shared keys)
    for label, qname in {
        "x_pack_bins_harmonic": "pack_bins_harmonic",
        "x_corpus_dsir_select": "corpus_dsir_select",
        "x_training_curation_funnel": "training_curation_funnel",
        # round-10 additions (VERDICT r9 next #3): both read spuriously
        # regressed in r9's RAW extras (1.53x / 1.24x) with no A/B row to
        # adjudicate them — now they have one
        "x_graph_bfs": "graph_bfs_distances",
        "x_rolling_median_wide": "window_rolling_median_wide",
    }.items():
        if qname in QUERIES:
            extras[label] = qname
    for label, qname in extras.items():
        t0 = time.perf_counter()
        force(QUERIES[qname].fn(spark, sf_dir))
        out[label] = round(time.perf_counter() - t0, 3)
    tpch = sorted(q for q in QUERIES if q.startswith("tpch_"))
    t0 = time.perf_counter()
    for name in tpch:
        force(QUERIES[name].fn(spark, sf_dir))
    out["x_tpch_total"] = round(time.perf_counter() - t0, 3)
    print("BENCH_ONCE " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
