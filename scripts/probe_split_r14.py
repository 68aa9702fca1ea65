"""Round-14 measurement probe: split each headline query's wall time into
(a) DataFrame construction (Python + py4j expression building),
(b) analysis/optimization (explain cost — plan-side),
(c) execution via noop sink (min-of-3, same forcing as bench.py).

Also dumps .explain('formatted') for each query to plans/r14/<q>_before.txt
(or _after.txt with PROBE_TAG=after).

Usage: python scripts/probe_split_r14.py [query ...]
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

HEADLINE = [
    "cdc_merge_lww", "m2_dedupe_latest", "mask_pipeline",
    "agg_pricing_summary", "agg_cube_lineitem", "join_revenue_by_nation",
    "window_topk_orders_per_customer", "dedup_exact", "dedup_minhash_lsh",
    "dedup_simhash", "similarity_cosine_topk", "similarity_lsh_buckets",
    "similarity_ivf_topk", "topk_unshipped_revenue", "window_rank_suite",
    "text_quality_scores", "text_fingerprint", "events_windowed_agg",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = os.environ.get("PROBE_TAG", "before")
    names = sys.argv[1:] or HEADLINE

    from tipoca_stream_spark.plans import QUERIES
    from tipoca_stream_spark.session import get_spark

    spark = get_spark("probe_split_r14")
    plans_dir = os.path.join(ROOT, "plans", "r14")
    os.makedirs(plans_dir, exist_ok=True)

    # warm as bench.py does
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    for warm in ("m2_dedupe_latest", "agg_pricing_summary"):
        QUERIES[warm].fn(spark, sf_dir).count()

    out = {}
    for name in names:
        qdef = QUERIES[name]
        t0 = time.perf_counter()
        df = qdef.fn(spark, sf_dir)
        t_construct = time.perf_counter() - t0

        t0 = time.perf_counter()
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        t_explain = time.perf_counter() - t0
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())

        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            qdef.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = {
            "construct": round(t_construct, 3),
            "explain": round(t_explain, 3),
            "noop_min3": round(best, 3),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print("PROBE_SPLIT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
