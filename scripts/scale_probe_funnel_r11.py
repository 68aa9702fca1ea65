"""Curvature probe for the cross-modal dedup funnel (round 11, VERDICT
r10 next #6): the funnel's three fingerprint passes and per-stage
semi-joins are linear on paper, but the COMPOSITION — three spill-pinned
fingerprint frames alive at once feeding chained survivor joins — had
only been run at sf0.1 (5k docs). This runs the exact registered plan
(plans.training.funnel_over_docs) on synthetic documents tables of
5k / 10k / 20k / 50k / 100k rows (1x / 2x / 4x / 10x / 20x the sf0.1
corpus) and records per-size wall time and stage survivor counts.

The claim under test: doubling the corpus roughly doubles wall time
(ratios <= ~1.3 of perfect doubling — SCALE.md's bar). Super-linear
growth would mean a survivor join degraded to a corpus-sized shuffle or
the checkpoint pins stopped holding.

Writes SCALE_PROBE_r11_funnel.json. Usage:
    python scripts/scale_probe_funnel_r11.py
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SIZES = [5000, 10000, 20000, 50000, 100000]


def main() -> None:
    from pyspark.sql import functions as F

    from tipoca_stream_spark.plans.training import funnel_over_docs
    from tipoca_stream_spark.session import get_spark

    spark = get_spark("funnel-scale-probe", shuffle_partitions=32)
    out: dict = {"probe": "multimodal_dedup_funnel_curvature", "sizes": {}}
    for n in SIZES:
        docs = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("d"), F.expr("repeat('x', 20 + cast(id % 37 as int))")
            ).alias("text"),
        )
        funnel_over_docs(docs).collect()  # warm (codegen, .so load)
        best, stages = float("inf"), None
        for _ in range(2):
            t0 = time.perf_counter()
            rows = funnel_over_docs(docs).collect()
            best = min(best, time.perf_counter() - t0)
            stages = {r["name"]: r["n_docs"] for r in rows}
        out["sizes"][str(n)] = {"sec": round(best, 2), "stages": stages}
        print(json.dumps({n: out["sizes"][str(n)]}), flush=True)
    import math

    secs = [out["sizes"][str(n)]["sec"] for n in SIZES]
    steps = [b / a for a, b in zip(SIZES, SIZES[1:])]  # 2,2,2.5,2
    out["doubling_ratios"] = [
        round((b / a) ** (1.0 / math.log2(s)), 2)
        for (a, b), s in zip(zip(secs, secs[1:]), steps)
    ]
    out["note"] = (
        "doubling_ratios normalizes the 2.5x step (20k->50k) to a "
        "per-doubling ratio; <= ~2.6 per doubling (1.3x of perfect "
        "linear) is the SCALE.md bar"
    )
    with open(os.path.join(ROOT, "SCALE_PROBE_r11_funnel.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
