"""Churn soak for the round-12 maintained fingerprint index
(IncrementalFingerprintIndex) — the same discipline that hardened the
MinHash index (soak_churn_r10) and the semantic index (soak_semchurn_r11):

Phase A (hot bucket): 40 dedup-mode batches x 200 fingerprints that all
share band 0 (first 8 bits constant), so every batch's candidates land in
the SAME index bucket — the adversarial layout for a band-bucketed index.
Evidence recorded per batch: wall time, index files scanned vs total
(file pruning must hold: a hot batch still reads only its touched
buckets), files-per-bucket after maintenance (compaction must bound the
hot bucket's chain), accepted/flagged counts.

Phase B (hot key): 15 batches that are EXACT copies of phase A's first
batch — zero index growth expected, all members flagged, flat cost.

Close: re-screen phase A batch 1 — every member must resolve to its
original index row (dup_of = the id it was first accepted under).

Writes SCALE_PROBE_r12_fpchurn.json.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_BATCHES_A = 40
N_BATCHES_B = 15
BATCH = 200


def make_fps(rng: random.Random, n: int, hot_prefix: str) -> list[str]:
    """n well-separated fingerprints sharing a hot 8-bit band-0 prefix:
    the 56 free bits are drawn with ~28 bits set, so two random draws
    differ by ~28 bits >> max_hamming — near-dup flags in phase A come
    only from genuine re-draws, not accidental collisions."""
    out = []
    seen = set()
    while len(out) < n:
        tail = "".join(rng.choice("01") for _ in range(56))
        if tail in seen:
            continue
        seen.add(tail)
        out.append(hot_prefix + tail)
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from tipoca_stream_spark.operators.incremental_fingerprint import (
        IncrementalFingerprintIndex,
    )
    from tipoca_stream_spark.operators.index_maintenance import (
        IndexMaintenancePolicy,
    )
    from tipoca_stream_spark.session import get_spark

    spark = get_spark("fp-churn-soak", shuffle_partitions=16)
    root = "/tmp/fpchurn_r12"
    shutil.rmtree(root, ignore_errors=True)
    pol = IndexMaintenancePolicy(compact_files_per_bucket=4, vacuum_keep=2)
    idx = IncrementalFingerprintIndex(spark, root, max_hamming=8, policy=pol)
    rng = random.Random(12)
    hot = "10101010"  # constant band 0: every fingerprint collides there

    def df(rows):
        return spark.createDataFrame(rows, ["media_id", "phash"]).withColumn(
            "media_id", F.col("media_id").cast("long")
        )

    record: dict = {"phase_a": [], "phase_b": [], "config": {
        "batches_a": N_BATCHES_A, "batches_b": N_BATCHES_B, "batch": BATCH,
        "hot_band0_prefix": hot, "compact_files_per_bucket": 4,
        "vacuum_keep": 2, "max_hamming": 8,
    }}

    batch1 = None
    next_id = 0
    for b in range(N_BATCHES_A):
        fps = make_fps(rng, BATCH, hot)
        rows = [(next_id + k, fp) for k, fp in enumerate(fps)]
        next_id += BATCH
        if b == 0:
            batch1 = rows
        t0 = time.time()
        accepted, matches = idx.ingest(df(rows), dedup=True)
        n_acc, n_flag = accepted.count(), matches.count()
        dt = time.time() - t0
        chains = pol.chain_lengths(idx.index)
        record["phase_a"].append({
            "batch": b, "secs": round(dt, 2),
            "accepted": n_acc, "flagged": n_flag,
            "files_scanned": idx.last_screen_stats.get("files_scanned"),
            "files_total": idx.last_screen_stats.get("files_total"),
            "max_chain": max(chains.values()) if chains else 0,
            "buckets_with_files": len(chains),
            "compactions": sum(
                1 for h in pol.history if h.get("compacted_buckets")
            ),
        })
        print(f"A{b:02d} {dt:6.2f}s acc={n_acc} flag={n_flag} "
              f"scan={idx.last_screen_stats} "
              f"maxchain={record['phase_a'][-1]['max_chain']}", flush=True)

    size_after_a = idx.fingerprints().count()

    # Phase B: exact-duplicate batches under NEW ids — zero growth expected
    for b in range(N_BATCHES_B):
        rows = [(next_id + k, fp) for k, (_, fp) in enumerate(batch1)]
        next_id += BATCH
        t0 = time.time()
        accepted, matches = idx.ingest(df(rows), dedup=True)
        n_acc, n_flag = accepted.count(), matches.count()
        dt = time.time() - t0
        record["phase_b"].append({
            "batch": b, "secs": round(dt, 2),
            "accepted": n_acc, "flagged": n_flag,
            "files_scanned": idx.last_screen_stats.get("files_scanned"),
            "files_total": idx.last_screen_stats.get("files_total"),
        })
        print(f"B{b:02d} {dt:6.2f}s acc={n_acc} flag={n_flag}", flush=True)

    size_after_b = idx.fingerprints().count()

    # close: batch 1 re-screen — all flagged, dup_of = original ids
    rescreen = idx.screen(df([(10**9 + k, fp) for k, (_, fp) in enumerate(batch1)]))
    got = {r["member_id"] - 10**9: r["dup_of"] for r in rescreen.collect()}
    orig = {k: mid for k, (mid, _) in enumerate(batch1)}
    all_flagged = len(got) == len(batch1)
    rule_ok = all(got.get(k) == orig[k] for k in orig)

    a_secs = [r["secs"] for r in record["phase_a"]]
    record["summary"] = {
        "index_size_after_a": size_after_a,
        "index_growth_in_b": size_after_b - size_after_a,
        "phase_a_secs_first5_mean": round(sum(a_secs[:5]) / 5, 2),
        "phase_a_secs_last5_mean": round(sum(a_secs[-5:]) / 5, 2),
        "phase_b_all_flagged_every_batch": all(
            r["flagged"] >= BATCH and r["accepted"] == 0
            for r in record["phase_b"]
        ),
        "close_batch1_all_flagged": all_flagged,
        "close_batch1_rule_ok": rule_ok,
        "total_compactions": sum(
            1 for h in pol.history if h.get("compacted_buckets")
        ),
        "lost_races": sum(len(h.get("lost_race", [])) for h in pol.history),
    }
    out = os.path.join(ROOT, "SCALE_PROBE_r12_fpchurn.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record["summary"], indent=1))


if __name__ == "__main__":
    main()
