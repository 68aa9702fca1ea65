"""Forward-looking probe (round 9): cost of the semantic screen's
batch-vs-seeds assignment (`assign_by_cosine` — broadcast k seeds,
batch×k cosine, argmax) as k grows. The maintenance policy keeps
k ∝ corpus (density-triggered requantize), so at 100 TB k reaches
10⁵-10⁶ and the per-batch assignment term — linear in k — eventually
dominates the screen. This probe measures the onset so the two-level
(√k-supercluster) prune is built when the data says so, not before.

Fixed batch of 2 000 64-dim vectors; k swept 16 → 8192. Expect ~linear
wall growth in k once past fixed costs; the row where per-batch
assignment exceeds the typical screen+commit cost (~1-2 s in the soak)
marks the onset.

Usage: python scripts/probe_assignment_cost_r9.py
→ SCALE_PROBE_r09_assignment.json + one JSON line.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DIM = 64
BATCH = 2000
KS = (16, 128, 1024, 8192)


def _vecs(spark, n, seed, id_offset=0):
    rows = []
    for i in range(n):
        rng = random.Random(seed * 1_000_003 + i)
        rows.append((id_offset + i, [rng.gauss(0.0, 1.0) for _ in range(DIM)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def main() -> None:
    from tipoca_stream_spark.operators.semantic_dedup import assign_by_cosine
    from tipoca_stream_spark.session import get_spark

    spark = get_spark("probe_assignment_r9", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    batch = _vecs(spark, BATCH, seed=1).persist()
    batch.count()
    from pyspark.sql import functions as F

    from tipoca_stream_spark.operators.semantic_dedup import (
        assign_by_cosine_two_level,
    )

    out = {}
    out2 = {}
    for k in KS:
        seeds = _vecs(spark, k, seed=7, id_offset=10_000_000).selectExpr(
            "vec_id as seed_id", "embedding as seed_vec"
        ).persist()
        seeds.count()

        def timed(fn):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                # consume cluster_id: a bare count() lets Catalyst ELIDE
                # the unused argmax aggregate (and with it every cosine)
                # — the first run of this probe read flat-in-k for
                # exactly that reason
                fn(batch, seeds, "vec_id", "embedding").agg(
                    F.sum("cluster_id")
                ).collect()
                best = min(best, time.perf_counter() - t0)
            return round(best, 3)

        out[f"k{k}"] = timed(assign_by_cosine)
        out2[f"k{k}"] = timed(assign_by_cosine_two_level)
        seeds.unpersist()
    res = {
        "probe": "assignment_cost_r9",
        "batch": BATCH,
        "dim": DIM,
        "flat_seconds_by_k": out,
        "two_level_seconds_by_k": out2,
        "reading": (
            "flat assignment is linear in k past fixed costs; the "
            "two-level (supercluster) assignment trades ~2*sqrt(k) "
            "cosines for k and wins past k~1e3 (fixed costs — three "
            "aggregate jobs + broadcasts — dominate below that)"
        ),
    }
    with open(os.path.join(ROOT, "SCALE_PROBE_r09_assignment.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
