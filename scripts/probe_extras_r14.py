"""Round-14 second-pass probe over the not-yet-examined bench extras:
per-query construct time, count-forced exec (min-of-N, same forcing as
bench.py's extras), and plan-shape counters (Exchange / Python-eval /
CodegenFallback-prone HOF nodes) — guide §1's measure-first step.

Usage: python scripts/probe_extras_r14.py [query ...]
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DEFAULT = [
    "bpe_pack_sequences",
    "training_pipeline_pack",
    "pack_bins_harmonic",
    "corpus_dsir_select",
    "training_curation_funnel",
    "multimodal_dedup_funnel",
    "multimodal_phash_group_rep",
    "multimodal_audio_near_dup",
    "corpus_contamination_screen",
    "skew_minhash_hot_bucket",
    "skew_cooccurrence_hot_group",
    "agg_heavy_hitters",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or DEFAULT
    from tipoca_stream_spark.plans import QUERIES
    from tipoca_stream_spark.session import get_spark

    spark = get_spark("probe_extras_r14")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    for warm in ("m2_dedupe_latest", "agg_pricing_summary"):
        QUERIES[warm].fn(spark, sf_dir).count()

    for name in names:
        if name not in QUERIES:
            print(f"{name}: NOT REGISTERED")
            continue
        spark.sparkContext.setJobDescription(f"probe_extras: {name}")
        t0 = time.perf_counter()
        df = QUERIES[name].fn(spark, sf_dir)
        t_con = time.perf_counter() - t0
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        execs = []
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[name].fn(spark, sf_dir).count()
            execs.append(time.perf_counter() - t0)
        print(
            f"{name:32s} con={t_con:5.2f} exec_min={min(execs):6.2f} "
            f"exch={plan.count('Exchange'):3d} "
            f"pyeval={plan.count('EvalPython') + plan.count('MapInPandas') + plan.count('FlatMapGroups'):2d} "
            f"sortagg={plan.count('SortAggregate'):2d} "
            f"cartesian={plan.count('Cartesian'):1d} "
            f"win={plan.count('Window'):2d}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
