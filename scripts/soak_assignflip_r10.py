"""Round-10 assign-mode-flip soak (VERDICT r9 next #1): drive the
incremental semantic index through enough growth that the maintenance
policy's density-triggered requantizes push k PAST the two-level
crossover, and show the policy flips the assignment rule mid-soak — with
the end-state counterfactual (the SAME screen forced flat at the same k)
measured beside it.

Geometry matches the r9 probe that located the crossover
(SCALE_PROBE_r09_assignment.json: batch=2000, dim=64 — the crossover is
in batch×k×dim assignment WORK, not k alone; a first cut of this soak at
dim=16/batch=1000 sat 67× below the probe's work scale and two-level
correctly lost to fixed plan costs there): target_per_cluster=16,
slack=2, 2000-vector batches → requantizes at batches ~1/3/7/15/31 grow
k 4 → 250 → 750 → 1750 (THE FLIP at threshold 1024) → 3750 → 7750.

Evidence produced:
- the flip fires mid-soak from the policy (per-batch mode trace, the
  rebuild's history record carries assign_mode=two_level);
- post-flip per-batch cost stays bounded while k quadruples 1750→7750
  (flat cost would scale linearly in k — the r9 probe's 11.6 s at
  k=8192 vs 1.6 s at k=1024 for this work shape);
- end-state A/B: the stored two_level screen assignment vs the same
  batch forced flat at the final k (min-of-3, aggregate-forced) — the
  isolated counterfactual the no-flip pipeline would pay every batch;
- correctness under the flip: a scaled dup of an early accepted vector
  is still flagged at the end, zero lost CAS races.

Cost note: a flat CONTROL arm is deliberately absent — its final
requantize alone (re-assigning 62k rows flat at k=7750) costs minutes
and proves nothing the end-state A/B doesn't.

Measurement discipline: the end-state A/B runs in a FRESH process over
the persisted index — the first cut ran it inside the 40-batch soak JVM
and read two_level at 10.4 s vs a fresh-JVM 3-ish s (flat was unaffected:
it is ONE scheduler job where two-level is ~6, and a JVM carrying 3000+
accumulated stages taxes per-job overhead — the same long-JVM effect the
r9 curvature probe hit; see memory: fresh JVM per measurement point).

Usage:
  python scripts/soak_assignflip_r10.py soak <index_root> [n_batches]
  python scripts/soak_assignflip_r10.py ab <index_root>
  python scripts/soak_assignflip_r10.py all [n_batches]   # orchestrates both
→ writes SCALE_PROBE_r10_assignflip.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH_VECS = 2000
DIM = 64
TARGET = 16
SLACK = 2.0
THRESHOLD = 1024


def _vec_batch(spark, ep: int):
    rows = []
    for i in range(BATCH_VECS):
        rng = random.Random(7_000_003 * ep + i)
        rows.append((ep * 100_000 + i, [rng.gauss(0.0, 1.0) for _ in range(DIM)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _soak(spark, root: str, n_batches: int) -> tuple[dict, object]:
    from tipoca_stream_spark.operators.incremental_semantic import (
        IncrementalSemanticDeduper,
    )
    from tipoca_stream_spark.operators.index_maintenance import (
        IndexMaintenancePolicy,
    )

    pol = IndexMaintenancePolicy(
        compact_files_per_bucket=8,
        target_per_cluster=TARGET,
        requantize_slack=SLACK,
        two_level_k_threshold=THRESHOLD,
        vacuum_keep=3,
    )
    seeds = _vec_batch(spark, 0).limit(4).selectExpr(
        "vec_id as seed_id", "embedding as seed_vec"
    )
    d = IncrementalSemanticDeduper(
        spark, root, seeds=seeds, threshold=0.999, policy=pol
    )
    per_batch = []
    flip_batch = None
    k_cur = 4
    for ep in range(n_batches):
        t0 = time.perf_counter()
        d.ingest(_vec_batch(spark, ep))
        dt = time.perf_counter() - t0
        rec = pol.history[-1]
        mode = d._mode_at(d.index.current_version())
        if rec["requantized"] is not None:
            k_cur = d.seeds.count()
        if flip_batch is None and mode == "two_level":
            flip_batch = ep
        per_batch.append(
            {
                "batch": ep,
                "s": round(dt, 3),
                "k": k_cur,
                "requantized": rec["requantized"] is not None,
                "mode": mode,
            }
        )
    steady = [r for r in per_batch if not r["requantized"]]
    mean = lambda xs: round(sum(xs) / len(xs), 3)  # noqa: E731
    post_flip = [r["s"] for r in steady if r["mode"] == "two_level"]
    pre_flip = [r["s"] for r in steady if r["mode"] == "flat"]
    out = {
        "threshold": THRESHOLD,
        "batches": n_batches,
        "batch_vecs": BATCH_VECS,
        "dim": DIM,
        "corpus_rows": d.index.read().count(),
        "k_final": d.seeds.count(),
        "final_mode": d._mode_at(d.index.current_version()),
        "flip_batch": flip_batch,
        "n_requantizes": sum(1 for r in per_batch if r["requantized"]),
        "pre_flip_mean_s": mean(pre_flip) if pre_flip else None,
        "post_flip_first5_mean_s": mean(post_flip[:5]) if post_flip else None,
        "post_flip_last5_mean_s": mean(post_flip[-5:]) if post_flip else None,
        "per_batch": per_batch,
        "lost_races": sum(len(r["lost_race"]) for r in pol.history),
        "flip_recorded_in_history": any(
            r.get("assign_mode") == "two_level" for r in pol.history
        ),
    }
    dup = d.index.read().filter("vec_id = 7").selectExpr(
        "vec_id + 9000000 as vec_id",
        "transform(embedding, x -> x * 2.0) as embedding",
    )
    out["dup_of_first_batch_flagged"] = d.screen(dup).count()
    return out, d


def _screen_ab(spark, d) -> dict:
    """Isolated assignment cost at the FINAL k: the same fresh batch
    assigned under the stored two_level rule vs forced flat — min of 3
    passes each, aggregate-forced (never a bare count)."""
    from pyspark.sql import functions as F

    batch = _vec_batch(spark, 999)
    base = d.index.current_version()
    seeds = d.seeds_at(base)
    timings = {}
    for mode in ("two_level", "flat"):
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            d._assigned(batch, seeds, mode).agg(F.sum("cluster_id")).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[mode] = round(best, 3)
    timings["flat_over_two_level"] = round(
        timings["flat"] / max(timings["two_level"], 1e-9), 2
    )
    return timings


ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "SCALE_PROBE_r10_assignflip.json",
)


def main() -> None:
    from tipoca_stream_spark.session import get_spark

    phase = sys.argv[1] if len(sys.argv) > 1 else "all"
    if phase == "all":
        work = tempfile.mkdtemp(prefix="soak_r10_")
        n = sys.argv[2] if len(sys.argv) > 2 else "40"
        try:
            for args in (["soak", work, n], ["ab", work]):
                subprocess.run(
                    [sys.executable, os.path.abspath(__file__)] + args,
                    check=True,
                )
        finally:
            shutil.rmtree(work, ignore_errors=True)
        with open(ARTIFACT) as f:
            print(json.dumps(json.load(f)["summary"]))
        return

    root = sys.argv[2]
    spark = get_spark(f"soak_assignflip_r10_{phase}", shuffle_partitions=8)
    if phase == "soak":
        n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 40
        soak, _ = _soak(spark, os.path.join(root, "flip"), n_batches)
        out = {
            "n_batches": n_batches,
            "batch_vecs": BATCH_VECS,
            "dim": DIM,
            "target_per_cluster": TARGET,
            "slack": SLACK,
            "two_level_k_threshold": THRESHOLD,
            "soak": soak,
        }
        with open(ARTIFACT, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps({"phase": "soak", "flip_batch": soak["flip_batch"],
                          "k_final": soak["k_final"]}))
    elif phase == "ab":
        from tipoca_stream_spark.operators.incremental_semantic import (
            IncrementalSemanticDeduper,
        )

        d = IncrementalSemanticDeduper(
            spark, os.path.join(root, "flip"), threshold=0.999
        )
        # warm the JVM the bench way before timing (codegen + broadcasts)
        _screen_ab(spark, d)
        ab = _screen_ab(spark, d)
        with open(ARTIFACT) as f:
            out = json.load(f)
        out["assignment_ab_at_final_k_fresh_jvm"] = ab
        soak = out["soak"]
        out["summary"] = {
            "flip_batch": soak["flip_batch"],
            "k_final": soak["k_final"],
            "final_mode": soak["final_mode"],
            "pre_flip_mean_s": soak["pre_flip_mean_s"],
            "post_flip_last5_mean_s": soak["post_flip_last5_mean_s"],
            "assignment_ab_at_final_k_fresh_jvm": ab,
        }
        with open(ARTIFACT, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out["summary"]))
    else:
        raise SystemExit(f"unknown phase {phase!r}")
    spark.stop()


if __name__ == "__main__":
    main()
