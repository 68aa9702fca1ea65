"""Round-9 maintenance-policy soak (VERDICT r8 next #1): hundreds of
batches through BOTH incremental dedupers with the IndexMaintenancePolicy
ON (chain-triggered bucket compaction, density-triggered trained
requantize, vacuum), measuring what the policy is supposed to guarantee:

- **per-batch ingest cost stays FLAT** across >10× corpus growth
  (windowed means: early / mid / late batches) — the O(batch) steady
  state the reference's in-cycle maintenance gives its loader
  (pkg/redshiftloader/load_processor.go:386-444);
- **files-per-bucket stays bounded** (max chain ≤ threshold+1 at every
  batch boundary, vs batches-count without the policy);
- **version history stays bounded** under vacuum;
- **screens stay file-pruned** (scanned < total at the end);
- **maintenance amortizes**: requantize count is O(log growth), and
  compaction commits are bucket-scoped (linked files > written files);
- **convergence**: a dup of the FIRST batch is still flagged at the end.

Usage: python scripts/soak_maintenance_r9.py [n_batches]
→ writes SCALE_PROBE_r09_soak.json and prints one JSON line.
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

N_BATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 200
BATCH_DOCS = 40
BATCH_VECS = 50
DIM = 16


def _doc_batch(spark, ep: int):
    rng = random.Random(1000 + ep)
    words = [f"tok{i}" for i in range(4000)]
    rows = [
        (f"d{ep}_{i}", " ".join(rng.choice(words) for _ in range(30)))
        for i in range(BATCH_DOCS)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _vec_batch(spark, ep: int):
    rows = []
    for i in range(BATCH_VECS):
        rng = random.Random(2_000_003 * ep + i)
        rows.append(
            (ep * 10_000 + i, [rng.gauss(0.0, 1.0) for _ in range(DIM)])
        )
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _windowed(times: list[float]) -> dict:
    k = max(len(times) // 10, 1)
    mean = lambda xs: round(sum(xs) / len(xs), 3)  # noqa: E731
    return {
        "early_s": mean(times[k : 2 * k]),  # skip warmup window
        "mid_s": mean(times[len(times) // 2 : len(times) // 2 + k]),
        "late_s": mean(times[-k:]),
        "late_over_early": round(
            (sum(times[-k:]) / k) / (sum(times[k : 2 * k]) / k), 2
        ),
    }


def soak_minhash(spark, root: str) -> dict:
    from tipoca_stream_spark.operators.incremental_dedup import IncrementalDeduper
    from tipoca_stream_spark.operators.index_maintenance import (
        IndexMaintenancePolicy,
    )

    pol = IndexMaintenancePolicy(compact_files_per_bucket=8, vacuum_keep=3)
    d = IncrementalDeduper(spark, root, policy=pol)
    first = _doc_batch(spark, 0)
    times, max_chain_seen = [], 0
    for ep in range(N_BATCHES):
        t0 = time.perf_counter()
        d.ingest(_doc_batch(spark, ep))
        times.append(time.perf_counter() - t0)
        mc = max(pol.chain_lengths(d.index).values(), default=0)
        max_chain_seen = max(max_chain_seen, mc)
    # convergence: dups of batch 0 still flagged after all maintenance
    copies = spark.createDataFrame(
        [(f"x{r['doc_id']}", r["text"]) for r in first.limit(5).collect()],
        ["doc_id", "text"],
    )
    dup_hits = d.screen(copies).select("new_id").distinct().count()
    compactions = [r for r in pol.history if r["compacted_buckets"]]
    return {
        "batches": N_BATCHES,
        "corpus_rows": d.index.read().count(),
        "per_batch": _windowed(times),
        "max_chain_seen": max_chain_seen,
        "final_versions": len(d.index.versions()),
        "n_compactions": len(compactions),
        "screen_files": dict(d.last_screen_stats),
        "dup_of_first_batch_flagged": dup_hits,
        "lost_races": sum(len(r["lost_race"]) for r in pol.history),
    }


def soak_semantic(spark, root: str) -> dict:
    from tipoca_stream_spark.operators.incremental_semantic import (
        IncrementalSemanticDeduper,
    )
    from tipoca_stream_spark.operators.index_maintenance import (
        IndexMaintenancePolicy,
    )

    pol = IndexMaintenancePolicy(
        compact_files_per_bucket=8,
        target_per_cluster=64,
        requantize_trained=True,
        vacuum_keep=3,
    )
    seeds = _vec_batch(spark, 0).limit(4).selectExpr(
        "vec_id as seed_id", "embedding as seed_vec"
    )
    d = IncrementalSemanticDeduper(
        spark, root, seeds=seeds, threshold=0.999, policy=pol
    )
    times, max_chain_seen, k_history = [], 0, []
    for ep in range(N_BATCHES):
        t0 = time.perf_counter()
        d.ingest(_vec_batch(spark, ep))
        times.append(time.perf_counter() - t0)
        mc = max(pol.chain_lengths(d.index).values(), default=0)
        max_chain_seen = max(max_chain_seen, mc)
    k_final = d.seeds.count()
    n = d.index.read().count()
    # cluster balance under the trained quantizer (nondegeneracy contract)
    from pyspark.sql import functions as F

    sizes = [
        r["cnt"]
        for r in d.index.read()
        .groupBy("cluster_id")
        .agg(F.count("*").alias("cnt"))
        .collect()
    ]
    requants = [r["requantized"] for r in pol.history if r["requantized"]]
    # convergence: scaled dup of an early accepted vector still flagged
    dup = d.index.read().filter("vec_id = 3").selectExpr(
        "vec_id + 900000 as vec_id",
        "transform(embedding, x -> x * 2.0) as embedding",
    )
    dup_hits = d.screen(dup).count()
    return {
        "batches": N_BATCHES,
        "corpus_rows": n,
        "per_batch": _windowed(times),
        "max_chain_seen": max_chain_seen,
        "final_versions": len(d.index.versions()),
        "n_requantizes": len(requants),
        "k_final": k_final,
        "mean_density": round(n / k_final, 1),
        "cluster_max_share": round(max(sizes) / sum(sizes), 3),
        "nonempty_clusters": len(sizes),
        "screen_files": dict(d.last_screen_stats),
        "dup_of_first_batch_flagged": dup_hits,
        "lost_races": sum(len(r["lost_race"]) for r in pol.history),
    }


def main() -> None:
    from tipoca_stream_spark.session import get_spark

    spark = get_spark("soak_maintenance_r9", shuffle_partitions=8)
    work = tempfile.mkdtemp(prefix="soak_r9_")
    try:
        out = {
            "n_batches": N_BATCHES,
            "minhash": soak_minhash(spark, os.path.join(work, "mh")),
            "semantic": soak_semantic(spark, os.path.join(work, "sem")),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_PROBE_r09_soak.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
