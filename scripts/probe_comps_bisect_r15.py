"""Round-15 in-process bisect of the components fixpoint probe shape:
lazy checkpoint + full count (current) vs eager + limit(1) (round 14)
vs eager + full count. Interleaved min-of-N over dedup_components in one
warmed JVM. Prints one JSON line.

Usage: python scripts/probe_comps_bisect_r15.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

MODES = ["lazy_count", "eager_limit", "eager_count"]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from tipoca_stream_spark.plans import QUERIES
    from tipoca_stream_spark.session import get_spark

    spark = get_spark("probe_comps_bisect_r15")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    QUERIES["dedup_components"].fn(spark, sf_dir).count()  # warm

    best: dict[str, float] = {m: float("inf") for m in MODES}
    for _ in range(reps):
        for m in MODES:
            os.environ["TSS_COMPONENTS_PROBE"] = m
            spark.sparkContext.setJobDescription(f"comps bisect {m}")
            t0 = time.perf_counter()
            QUERIES["dedup_components"].fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best[m] = min(best[m], dt)
            print(f"{m}: {dt:.3f}", flush=True)
    print("PROBE_COMPS " + json.dumps({m: round(v, 3) for m, v in best.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
