"""Round-10 adversarial-churn soak for the maintained MinHash index
(VERDICT r9 next #7): the 200-batch r9 soak used UNIFORM batches — every
bucket's chain grew at the same rate. This soak makes one bucket absorb
an append on EVERY batch and verifies the policy's bucket-scoped
compaction keeps that bucket's chain bounded and the screen cost flat
while the cold buckets idle.

Phase A — hot-bucket appends: a candidate pool of distinct documents is
pre-passed through the deduper's own band machinery and REJECTION-
SAMPLED to docs with ≥1 band row hashing to index bucket 0 (the same
murmur3+pmod the writer uses — no test-side reimplementation). Every
batch therefore touches bucket 0, while each cold bucket is touched only
~p = 1 - (1 - 1/32)^(6·4-1) ≈ 50% of batches — bucket 0's chain grows ~2×
faster and the compaction trigger must fire on it disproportionately.
Evidence: per-batch wall flat, max chain ≤ threshold+1 at every batch
boundary, bucket 0 present in compaction records at ≥ the rate of any
other bucket, dup-of-first-batch still flagged at the end.

Phase B — hot band KEY: near-identical documents (shared boilerplate, one
unique token each) share band keys outright — the candidate join's hot
bucket. After the first batch seeds the index, every later doc must be
flagged against it with flat screen cost and ZERO index growth (flagged
docs are never appended), i.e. churn that never lands a row cannot grow
any chain.

Usage: python scripts/soak_churn_r10.py [n_batches_a]
→ writes SCALE_PROBE_r10_churn.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BATCHES_A = int(sys.argv[1]) if len(sys.argv) > 1 else 50
BATCH_DOCS = 6
POOL = 3200
N_BATCHES_B = 20


def _pool(spark):
    rng = random.Random(424_242)
    words = [f"tok{i}" for i in range(4000)]
    rows = [
        (f"p{i}", " ".join(rng.choice(words) for _ in range(30)))
        for i in range(POOL)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


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


def phase_a(spark, root: str) -> dict:
    from pyspark.sql import functions as F

    from tipoca_stream_spark.operators.incremental_dedup import IncrementalDeduper
    from tipoca_stream_spark.operators.index_maintenance import (
        IndexMaintenancePolicy,
    )

    pol = IndexMaintenancePolicy(compact_files_per_bucket=4, vacuum_keep=3)
    d = IncrementalDeduper(spark, root, policy=pol)
    pool = _pool(spark)
    # rejection sample THROUGH the operator's own hashing: docs with at
    # least one band row in bucket 0
    bands = d._band_rows(d._signatures(pool, "text", "doc_id"), "doc_id")
    hot_ids = sorted(
        r["doc_id"]
        for r in bands.withColumn("_b", d.index.bucket_of())
        .filter(F.col("_b") == 0)
        .select("doc_id")
        .distinct()
        .collect()
    )
    need = N_BATCHES_A * BATCH_DOCS
    assert len(hot_ids) >= need, (len(hot_ids), need)
    hot_rows = {
        r["doc_id"]: r["text"]
        for r in pool.filter(F.col("doc_id").isin(hot_ids[:need])).collect()
    }
    times, max_chain_seen, chain0_seen = [], 0, 0
    first_batch_ids = hot_ids[:BATCH_DOCS]
    for ep in range(N_BATCHES_A):
        ids = hot_ids[ep * BATCH_DOCS : (ep + 1) * BATCH_DOCS]
        batch = spark.createDataFrame(
            [(i, hot_rows[i]) for i in ids], ["doc_id", "text"]
        )
        t0 = time.perf_counter()
        d.ingest(batch)
        times.append(time.perf_counter() - t0)
        chains = pol.chain_lengths(d.index)
        max_chain_seen = max(max_chain_seen, max(chains.values(), default=0))
        chain0_seen = max(chain0_seen, chains.get(0, 0))
    compactions = [r["compacted_buckets"] for r in pol.history if r["compacted_buckets"]]
    bucket0_compactions = sum(1 for c in compactions if 0 in c)
    # convergence under churn: dups of the FIRST batch still flagged
    copies = spark.createDataFrame(
        [(f"x{i}", hot_rows[i]) for i in first_batch_ids], ["doc_id", "text"]
    )
    dup_hits = d.screen(copies).select("new_id").distinct().count()
    return {
        "batches": N_BATCHES_A,
        "batch_docs": BATCH_DOCS,
        "hot_pool": len(hot_ids),
        "corpus_rows": d.index.read().count(),
        "per_batch": _windowed(times),
        "max_chain_seen": max_chain_seen,
        "max_chain_bucket0": chain0_seen,
        "n_compactions": len(compactions),
        "bucket0_compactions": bucket0_compactions,
        "final_versions": len(d.index.versions()),
        "screen_files": dict(d.last_screen_stats),
        "dup_of_first_batch_flagged": dup_hits,
        "lost_races": sum(len(r["lost_race"]) for r in pol.history),
    }


def phase_b(spark, root: str) -> dict:
    from tipoca_stream_spark.operators.incremental_dedup import IncrementalDeduper
    from tipoca_stream_spark.operators.index_maintenance import (
        IndexMaintenancePolicy,
    )

    pol = IndexMaintenancePolicy(compact_files_per_bucket=4, vacuum_keep=3)
    d = IncrementalDeduper(spark, root, policy=pol)
    boiler = " ".join(f"w{i}" for i in range(30))
    times, accepted_after_seed, flagged_total = [], 0, 0
    for ep in range(N_BATCHES_B):
        batch = spark.createDataFrame(
            [(f"b{ep}_{i}", f"{boiler} u{ep}_{i}") for i in range(10)],
            ["doc_id", "text"],
        )
        t0 = time.perf_counter()
        acc, pairs = d.ingest(batch)
        times.append(time.perf_counter() - t0)
        n_acc = acc.count()
        flagged_total += pairs.select("new_id").distinct().count()
        pairs.unpersist()
        if ep > 0:
            accepted_after_seed += n_acc
    return {
        "batches": N_BATCHES_B,
        "per_batch": _windowed(times),
        "accepted_after_seed": accepted_after_seed,
        "flagged_total": flagged_total,
        "corpus_rows": d.index.read().count(),
        "max_chain_seen": max(
            pol.chain_lengths(d.index).values(), default=0
        ),
    }


def main() -> None:
    from tipoca_stream_spark.session import get_spark

    spark = get_spark("soak_churn_r10", shuffle_partitions=8)
    work = tempfile.mkdtemp(prefix="soak_churn_")
    try:
        out = {
            "phase_a_hot_bucket": phase_a(spark, os.path.join(work, "a")),
            "phase_b_hot_key": phase_b(spark, os.path.join(work, "b")),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_PROBE_r10_churn.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
