"""Round-11 adversarial-churn soak for the SEMANTIC index (VERDICT r10
next #4): the round-10 churn soak covered the MinHash index; this runs
the same hot-bucket/hot-key phases against ``IncrementalSemanticDeduper``
with the policy flip enabled. The failure mode under test is the one the
two-level docstring names (semantic_dedup.py): a pathologically hot
CLUSTER absorbing most appends — quantizer skew.

Phase A — hot-cluster appends: every batch is a cone of vectors around
ONE direction, pairwise-spread below the dup threshold (so everything is
accepted and appended) but initially all assigned to the SAME seed. A
frozen quantizer would degrade the screen to O(batch x corpus): the
whole corpus lands in one cluster, and every batch joins against all of
it. The claim: the density-triggered requantize SPLITS the hot cone —
grown seeds are drawn from the stored vectors themselves, so new seeds
land inside the cone and shatter it — keeping per-batch cost flat
(late/early ~1) and max cluster size bounded while k crosses the
two-level flip threshold mid-soak (the r10 assign-flip soak's trigger,
now under adversarial skew instead of uniform growth).

Phase B — hot KEY churn: every batch is exact near-dups (cosine ~1) of
already-accepted vectors. All flagged, ZERO index growth, flat screen
cost — churn that never lands a row cannot grow any cluster.

Usage: python scripts/soak_semchurn_r11.py [n_batches_a]
→ writes SCALE_PROBE_r11_semchurn.json and prints one JSON line.
"""

from __future__ import annotations

import json
import math
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BATCHES_A = int(sys.argv[1]) if len(sys.argv) > 1 else 60
BATCH_VECS = 40
DIM = 16
SPREAD = 0.5
N_BATCHES_B = 15

TARGET_PER_CLUSTER = 8
SLACK = 2.0
FLIP_K = 256


def _unit(v):
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def _cone_vec(rng: random.Random):
    """unit(e1 + SPREAD * g), g a random unit vector orthogonal to e1:
    cos(v, e1) = 1/sqrt(1+SPREAD^2) ~ 0.894 (routes to the e1 seed while
    the initial seeds are the axes), and pairwise cos(v_i, v_j) =
    (1 + SPREAD^2 * cos(g_i, g_j)) / (1 + SPREAD^2) <= ~0.996 < 0.999
    for random 15-dim g's — accepted, never flagged."""
    g = [0.0] + [rng.gauss(0.0, 1.0) for _ in range(DIM - 1)]
    g = _unit(g)
    return _unit([1.0 + SPREAD * g[0]] + [SPREAD * x for x in g[1:]])


def _windowed(times: list[float]) -> dict:
    k = max(len(times) // 8, 1)
    mean = lambda xs: round(sum(xs) / len(xs), 3)  # noqa: E731
    return {
        "early_s": mean(times[k : 2 * k]),
        "late_s": mean(times[-k:]),
        "late_over_early": round(
            (sum(times[-k:]) / k) / (sum(times[k : 2 * k]) / k), 2
        ),
    }


def _axis_seeds(spark, n=4):
    rows = []
    for i in range(n):
        v = [0.0] * DIM
        v[i] = 1.0
        rows.append((i, v))
    return spark.createDataFrame(rows, "seed_id long, seed_vec array<double>")


def phase_a(spark, root: str) -> dict:
    from pyspark.sql import functions as F

    from tipoca_stream_spark.operators.incremental_semantic import (
        IncrementalSemanticDeduper,
    )
    from tipoca_stream_spark.operators.index_maintenance import (
        IndexMaintenancePolicy,
    )

    pol = IndexMaintenancePolicy(
        compact_files_per_bucket=4,
        target_per_cluster=TARGET_PER_CLUSTER,
        requantize_slack=SLACK,
        two_level_k_threshold=FLIP_K,
        vacuum_keep=3,
    )
    d = IncrementalSemanticDeduper(
        spark, root, seeds=_axis_seeds(spark), policy=pol
    )
    rng = random.Random(111_111)
    vecs = [_cone_vec(rng) for _ in range(N_BATCHES_A * BATCH_VECS)]
    # the generator's spread claim, verified not assumed (sampled pairs)
    smp = random.Random(7)

    def _pair():
        i = smp.randrange(len(vecs))
        j = smp.randrange(len(vecs) - 1)
        j = j if j < i else j + 1  # distinct indices
        return sum(a * b for a, b in zip(vecs[i], vecs[j]))

    max_pair = max(_pair() for _ in range(20000))
    assert max_pair < 0.999, max_pair

    times, accepted_total = [], 0
    k_series, mode_series, maxcluster_series = [], [], []
    first_batch = [(i, vecs[i]) for i in range(BATCH_VECS)]
    for ep in range(N_BATCHES_A):
        rows = [
            (ep * BATCH_VECS + j, vecs[ep * BATCH_VECS + j])
            for j in range(BATCH_VECS)
        ]
        batch = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        t0 = time.perf_counter()
        n_acc, flagged = d.ingest(batch)
        times.append(time.perf_counter() - t0)
        accepted_total += n_acc
        if ep % 8 == 7 or ep == N_BATCHES_A - 1:
            base = d.index.current_version()
            k_series.append(d.seeds_at(base).count())
            mode_series.append(d._mode_at(base))
            maxcluster_series.append(
                d.index.read()
                .groupBy("cluster_id")
                .count()
                .agg(F.max("count"))
                .collect()[0][0]
            )
    requants = [r for r in pol.history if r.get("requantized") is not None]
    rq_batches = [pol.history.index(r) for r in requants]
    # The windowed late/early ratio is a SAWTOOTH artifact under slack-2
    # requantizes: density doubles between rebuilds (screen candidates
    # per batch grow with it), then a requantize resets it. Compare
    # like-for-like phases: mean of the 2 batches right AFTER each
    # requantize (low density) vs the 2 right BEFORE the next trigger
    # (peak density) — the bounded envelope claim is that the peak/valley
    # ratio stays ~<= slack and the post-requantize valleys do not drift.
    valleys = [
        times[b + 1]
        for b in rq_batches
        if b + 1 < len(times)
    ]
    corpus = d.index.read().count()
    # answers intact under churn: exact copies of the FIRST batch's
    # vectors (cosine 1.0) must all be flagged against the final index
    copies = spark.createDataFrame(
        [(10_000_000 + i, v) for i, v in first_batch],
        "vec_id long, embedding array<double>",
    )
    dup_hits = d.screen(copies).select("vec_id").distinct().count()
    base = d.index.current_version()
    return {
        "batches": N_BATCHES_A,
        "batch_vecs": BATCH_VECS,
        "max_pairwise_cosine_sampled": round(max_pair, 6),
        "corpus_rows": corpus,
        "accepted_total": accepted_total,
        "per_batch": _windowed(times),
        "times_s": [round(t, 2) for t in times],
        "requantize_valleys_s": [round(t, 2) for t in valleys],
        "valley_drift": round(valleys[-1] / valleys[0], 2) if len(valleys) > 1 else None,
        "n_requantizes": len(requants),
        "requantize_batches": rq_batches,
        "k_series": k_series,
        "assign_mode_series": mode_series,
        "max_cluster_series": maxcluster_series,
        "final_k": d.seeds_at(base).count(),
        "final_assign_mode": d._mode_at(base),
        "final_max_cluster": maxcluster_series[-1],
        "flip_fired": any(r.get("assign_mode") == "two_level" for r in requants),
        "dup_of_first_batch_flagged": dup_hits,
        "screen_files": dict(d.last_screen_stats),
        "lost_races": sum(len(r["lost_race"]) for r in pol.history),
    }


def phase_b(spark, root: str) -> dict:
    from tipoca_stream_spark.operators.incremental_semantic import (
        IncrementalSemanticDeduper,
    )
    from tipoca_stream_spark.operators.index_maintenance import (
        IndexMaintenancePolicy,
    )

    pol = IndexMaintenancePolicy(
        compact_files_per_bucket=4,
        target_per_cluster=TARGET_PER_CLUSTER,
        requantize_slack=SLACK,
        two_level_k_threshold=FLIP_K,
        vacuum_keep=3,
    )
    d = IncrementalSemanticDeduper(
        spark, root, seeds=_axis_seeds(spark), policy=pol
    )
    rng = random.Random(222_222)
    seed_vecs = [_cone_vec(rng) for _ in range(30)]
    d.ingest(
        spark.createDataFrame(
            list(enumerate(seed_vecs)), "vec_id long, embedding array<double>"
        )
    )
    rows_after_seed = d.index.read().count()
    times, accepted_after_seed, flagged_total = [], 0, 0
    for ep in range(N_BATCHES_B):
        # exact copies of accepted vectors: cosine 1.0 -> always flagged
        batch = spark.createDataFrame(
            [
                (1000 + ep * 20 + i, seed_vecs[(ep * 20 + i) % len(seed_vecs)])
                for i in range(20)
            ],
            "vec_id long, embedding array<double>",
        )
        t0 = time.perf_counter()
        n_acc, flagged = d.ingest(batch)
        times.append(time.perf_counter() - t0)
        accepted_after_seed += n_acc
        flagged_total += flagged.select("vec_id").distinct().count()
    return {
        "batches": N_BATCHES_B,
        "per_batch": _windowed(times),
        "accepted_after_seed": accepted_after_seed,
        "flagged_total": flagged_total,
        "corpus_rows": d.index.read().count(),
        "corpus_rows_after_seed_batch": rows_after_seed,
        "index_grew_under_dup_churn": d.index.read().count() != rows_after_seed,
    }


def main() -> None:
    from tipoca_stream_spark.session import get_spark

    spark = get_spark("soak_semchurn_r11", shuffle_partitions=8)
    work = tempfile.mkdtemp(prefix="soak_semchurn_")
    try:
        out = {
            "phase_a_hot_cluster": phase_a(spark, os.path.join(work, "a")),
            "phase_b_hot_key": phase_b(spark, os.path.join(work, "b")),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_PROBE_r11_semchurn.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
