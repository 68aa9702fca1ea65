"""Round-7 scale probe: the new operators at sf0.1 vs .scale/sf1 (10×).

Semantic dedup gets the interesting treatment: with the quantizer's k
FIXED, the cluster-confined pair stage grows ~quadratically by design
(n²/k) — that is the measurement, not a bug; the deployment rule is
k ∝ n (SemDeDup runs tens of thousands of clusters at web scale), which
holds per-cluster pair work constant. Both settings are probed so the
knob's effect is a number, not a claim:

- ``dedup_semantic_k8``: 8 seeds at both scales (fixed k — expect the
  pair stage to dominate at 10×),
- ``dedup_semantic_k_scaled``: 8 seeds at sf0.1 → 80 at sf1 (k ∝ n —
  expect near-linear).

The other round-7 ops are expected flat-to-linear: the wide rolling
median (per-row skiplist step), the composite routed read (file-count
pruning), and the sidecar phrase search after a delta commit
(term-frequency-sized joins).

Usage: python scripts/scale_probe_r7.py  → one JSON line + a table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SMALL = "/root/testdata/sf0.1"
BIG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale/sf1")


def best_of(reps, run):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def semantic_run(spark, sf_dir: str, n_seeds: int) -> int:
    """The dedup_semantic pipeline with a parameterized seed count
    (seeds = the first n_seeds vectors, matching the registered query's
    convention at n_seeds=8)."""
    from tipoca_stream_spark.operators.semantic_dedup import semantic_dedup
    from tipoca_stream_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    if emb.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism:
        emb = emb.repartition(spark.sparkContext.defaultParallelism)
    copies = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1_000_000_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double") * 1.5).alias("embedding"),
    )
    corpus = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).unionByName(copies)
    seeds = (
        emb.orderBy("vec_id")
        .limit(n_seeds)
        .select(F.col("vec_id").alias("seed_id"), F.col("embedding").alias("seed_vec"))
    )
    return semantic_dedup(corpus, seeds, 0.999).count()


def main() -> None:
    from tipoca_stream_spark.plans import QUERIES
    from tipoca_stream_spark.session import get_spark

    if not os.path.isdir(BIG):
        raise SystemExit(f"{BIG} missing — run scripts/make_scale_dataset.py first")
    spark = get_spark("scale_probe_r7")
    spark.read.parquet(f"{SMALL}/lineitem.parquet").count()  # warm JVM

    out = {"mult": 10.0, "ops": {}}

    def probe(name, small_run, big_run, reps=2):
        a = best_of(reps, small_run)
        b = best_of(reps, big_run)
        out["ops"][name] = {"sf0.1_s": a, "sf1_s": b, "ratio": round(b / a, 2)}

    probe(
        "dedup_semantic_k8",
        lambda: semantic_run(spark, SMALL, 8),
        lambda: semantic_run(spark, BIG, 8),
    )
    probe(
        "dedup_semantic_k_scaled",
        lambda: semantic_run(spark, SMALL, 8),
        lambda: semantic_run(spark, BIG, 80),
    )
    for q in (
        "window_rolling_median_wide",
        "storage_routed_composite_read",
        "text_index_phrase_incremental",
        "dedup_semantic_incremental",
    ):
        qdef = QUERIES[q]
        probe(
            q,
            lambda qdef=qdef: qdef.fn(spark, SMALL).count(),
            lambda qdef=qdef: qdef.fn(spark, BIG).count(),
        )

    print(f"| op | sf0.1 s | sf1 s | ratio |")
    print("|---|---|---|---|")
    for k, v in out["ops"].items():
        print(f"| {k} | {v['sf0.1_s']:.3f} | {v['sf1_s']:.3f} | {v['ratio']:.1f}x |")
    with open("SCALE_PROBE_r07.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
