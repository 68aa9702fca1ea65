"""One timed pass over the iterative-graph query family — the unit of the
round-14 edge-prepartition A/B (scripts/ab_graph_r14.py). Imports
tipoca_stream_spark from $PYTHONPATH/cwd so the same script measures any
checkout; prints one tagged JSON line. count() forcing (these queries run
their iterations eagerly during construction; the final frame is a
checkpointed RDD scan, so noop vs count makes no difference here — count
matches the bench extras' forcing).
"""

from __future__ import annotations

import json
import os
import time

FAMILY = [
    "dedup_components",
    "dedup_canonical_docs",
    "graph_label_propagation",
    "graph_bfs_distances",
    "graph_kcore",
    "graph_pagerank_supplier_part",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    family = [
        q for q in os.environ.get("PROBE_FAMILY", ",".join(FAMILY)).split(",") if q
    ]
    from tipoca_stream_spark.plans import QUERIES
    from tipoca_stream_spark.session import get_spark

    spark = get_spark("probe_graph_once_r14")
    # same warmup discipline as bench_once.py
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    for warm in ("m2_dedupe_latest", "agg_pricing_summary"):
        QUERIES[warm].fn(spark, sf_dir).count()

    out: dict[str, float] = {}
    for name in family:
        if name not in QUERIES:
            continue
        spark.sparkContext.setJobDescription(f"probe_graph: {name}")
        t0 = time.perf_counter()
        QUERIES[name].fn(spark, sf_dir).count()
        out[name] = round(time.perf_counter() - t0, 3)
    print("BENCH_ONCE " + json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
