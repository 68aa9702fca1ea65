"""Round-8 scale probe: the incremental-index family after the O(batch)
rebuild, at sf0.1 vs .scale/sf1 (10× rows).

What changed since SCALE_PROBE_r07.json and what each row should show:

- ``dedup_semantic`` / ``dedup_semantic_incremental`` — the REGISTERED
  queries now derive k from the data (k = max(8, n//64)), so the graded
  plan is the constant-density regime. Expect ≤2× at 10× (r7 registered
  the frozen-k=8 regime: 20×/19×).
- ``dedup_semantic_k8_frozen`` — the fixed-k contrast row, kept so the
  knob's effect stays a measurement (expect ~20×: n²/k pair growth is
  the design, not a bug).
- ``sem_ingest_fixed_batch`` / ``minhash_ingest_fixed_batch`` — the
  O(batch) commit claims: ingest the SAME batch against a 1×-corpus
  index and a 10×-corpus index. r7 rewrote the whole index per ingest
  (cost ∝ corpus, measured 18.6× on the registered query); with
  append_delta the ratio should be ~flat.
- ``sem_screen_after_requantize`` — the growth protocol: screen a fixed
  batch against the 10× index with its bootstrap quantizer (density
  drifted 10× high) vs after ``maybe_requantize`` restores the density
  target. The requantized screen should be several times cheaper and
  land near the 1×-index screen.
- ``rolling_median_wide_hot_key`` — every event collapsed onto ONE key
  (w=101, order-statistic path): the chunked fold must spread one key's
  full history across tasks instead of one pandas group (r7 shape).

Usage: python scripts/scale_probe_r8.py  → one JSON line + a table.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
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


def _emb(spark, sf_dir):
    from tipoca_stream_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    if emb.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism:
        emb = emb.repartition(spark.sparkContext.defaultParallelism)
    return emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


def _docs(spark, sf_dir):
    from tipoca_stream_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    if docs.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism:
        docs = docs.repartition(spark.sparkContext.defaultParallelism)
    return docs.select("doc_id", "text")


def semantic_frozen_k(spark, sf_dir: str) -> int:
    """The r7 registered shape: one-shot semantic dedup with k frozen at 8."""
    from tipoca_stream_spark.operators.semantic_dedup import semantic_dedup

    emb = _emb(spark, sf_dir)
    copies = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1_000_000_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.5).alias("embedding"),
    )
    corpus = emb.unionByName(copies)
    seeds = emb.orderBy("vec_id").limit(8).select(
        F.col("vec_id").alias("seed_id"), F.col("embedding").alias("seed_vec")
    )
    return semantic_dedup(corpus, seeds, 0.999).count()


def build_sem_index(spark, sf_dir: str, root: str):
    """Bootstrap an incremental semantic index over a corpus, quantized at
    the density target (k = n//64) — the steady state a live pipeline
    maintains via maybe_requantize."""
    from tipoca_stream_spark.operators.incremental_semantic import (
        IncrementalSemanticDeduper,
    )

    emb = _emb(spark, sf_dir)
    k = max(8, emb.count() // 64)
    seeds = emb.orderBy("vec_id").limit(k).select(
        F.col("vec_id").alias("seed_id"), F.col("embedding").alias("seed_vec")
    )
    d = IncrementalSemanticDeduper(spark, root, seeds=seeds, threshold=0.999)
    d.ingest(emb)
    return d


def main() -> None:
    from tipoca_stream_spark.operators.incremental_dedup import IncrementalDeduper
    from tipoca_stream_spark.operators.incremental_semantic import (
        IncrementalSemanticDeduper,
    )
    from tipoca_stream_spark.plans import QUERIES
    from tipoca_stream_spark.session import get_spark

    if not os.path.isdir(BIG):
        raise SystemExit(f"{BIG} missing — run scripts/make_scale_dataset.py first")
    spark = get_spark("scale_probe_r8")
    spark.read.parquet(f"{SMALL}/lineitem.parquet").count()  # warm JVM

    out = {"mult": 10.0, "ops": {}}

    def probe(name, small_run, big_run, reps=2):
        a = best_of(reps, small_run)
        b = best_of(reps, big_run)
        out["ops"][name] = {"sf0.1_s": a, "sf1_s": b, "ratio": round(b / a, 2)}
        print(f"[probe] {name}: {a:.3f}s -> {b:.3f}s ({b/a:.1f}x)", file=sys.stderr)

    # registered queries, now k ∝ n
    for q in ("dedup_semantic", "dedup_semantic_incremental",
              "dedup_incremental_minhash", "window_rolling_median_wide"):
        qdef = QUERIES[q]
        probe(
            q,
            lambda qdef=qdef: qdef.fn(spark, SMALL).count(),
            lambda qdef=qdef: qdef.fn(spark, BIG).count(),
        )

    # frozen-k contrast (the regime NOT to deploy; reps=1 — it's slow by design)
    probe(
        "dedup_semantic_k8_frozen",
        lambda: semantic_frozen_k(spark, SMALL),
        lambda: semantic_frozen_k(spark, BIG),
        reps=1,
    )

    # execution-only semantic row: build the plan once per scale, time the
    # SECOND count — separates the per-fresh-plan fixed costs (analysis +
    # codegen + broadcast builds, ~5 s at any SF) that dominate the
    # registered query's small-scale wall time from how the executed work
    # actually scales
    def exec_only(sf_dir):
        df = QUERIES["dedup_semantic"].fn(spark, sf_dir)
        df.count()
        t0 = time.perf_counter()
        df.count()
        return time.perf_counter() - t0

    a = round(min(exec_only(SMALL) for _ in range(2)), 3)
    b = round(min(exec_only(BIG) for _ in range(2)), 3)
    out["ops"]["dedup_semantic_exec_only"] = {
        "sf0.1_s": a, "sf1_s": b, "ratio": round(b / a, 2)
    }
    print(f"[probe] dedup_semantic_exec_only: {a:.3f}s -> {b:.3f}s", file=sys.stderr)

    # O(batch) ingest: same 200-vector batch against a 1x and a 10x index
    tmp = tempfile.mkdtemp(prefix="probe_r8_")
    try:
        d_small = build_sem_index(spark, SMALL, os.path.join(tmp, "sem_small"))
        d_big = build_sem_index(spark, BIG, os.path.join(tmp, "sem_big"))
        # NB: derive probe batches by FILTER, never limit — a limit plans
        # GlobalLimit → Exchange SinglePartition, and everything downstream
        # (the batch×k assignment crossJoin included) runs in one task,
        # which is what this probe would falsely attribute to the operator
        batch_small = _emb(spark, SMALL).filter(F.col("vec_id") % 10 == 0).select(
            (F.col("vec_id") + 5_000_000_000).alias("vec_id"),
            F.transform("embedding", lambda x: x * 1.5).alias("embedding"),
        )

        def ingest_against(d):
            # fresh ids per rep so the commit is a real append every time
            nonce = int(time.time() * 1000) % 1_000_000
            b = batch_small.select(
                (F.col("vec_id") + nonce).alias("vec_id"), "embedding"
            )
            d.ingest(b)

        probe(
            "sem_ingest_fixed_batch",
            lambda: ingest_against(d_small),
            lambda: ingest_against(d_big),
        )

        # MinHash twin: same 100-doc batch against 1x and 10x band index
        m_small = IncrementalDeduper(spark, os.path.join(tmp, "lsh_small"))
        m_small.ingest(_docs(spark, SMALL))
        m_big = IncrementalDeduper(spark, os.path.join(tmp, "lsh_big"))
        m_big.ingest(_docs(spark, BIG))
        doc_batch = _docs(spark, SMALL).filter(F.col("doc_id") % 50 == 0)

        def m_ingest(m):
            nonce = int(time.time() * 1000) % 1_000_000
            b = doc_batch.select(
                (F.col("doc_id") + 7_000_000_000 + nonce).alias("doc_id"), "text"
            )
            m.ingest(b)

        probe(
            "minhash_ingest_fixed_batch",
            lambda: m_ingest(m_small),
            lambda: m_ingest(m_big),
        )

        # growth protocol: screen a fixed batch against the 10x index
        # quantized at bootstrap k (density 10x over target) vs after
        # maybe_requantize restores k ∝ n
        d_stale = build_sem_index(spark, SMALL, os.path.join(tmp, "sem_grow"))
        d_stale.ingest(
            _emb(spark, BIG).select(
                (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
            )
        )  # corpus now 11x the quantizer's design size
        # a REAL batch (2000 vectors, filter-derived — see note above): at
        # this size per-candidate work dominates fixed overheads, so the
        # density win is measurable
        screen_batch = _emb(spark, BIG).filter(F.col("vec_id") % 10 == 0).select(
            (F.col("vec_id") + 9_000_000_000).alias("vec_id"),
            F.transform("embedding", lambda x: x * 1.5).alias("embedding"),
        )
        t_stale = best_of(2, lambda: d_stale.screen(screen_batch).count())
        v = d_stale.maybe_requantize(target_per_cluster=64)
        assert v is not None, "density 11x over target must trigger requantize"
        t_fresh = best_of(2, lambda: d_stale.screen(screen_batch).count())
        out["ops"]["sem_screen_after_requantize"] = {
            "stale_quantizer_s": t_stale,
            "requantized_s": t_fresh,
            "ratio": round(t_fresh / t_stale, 2),
        }
        print(
            f"[probe] sem_screen_after_requantize: {t_stale:.3f}s -> "
            f"{t_fresh:.3f}s ({t_fresh/t_stale:.2f}x)",
            file=sys.stderr,
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # hot-key rolling median: ONE key holds every event (sf1: 1M rows)
    from tipoca_stream_spark.operators.rolling import rolling_median
    from tipoca_stream_spark.sources.tables import load_table

    def hot_rolling(sf_dir):
        ev = load_table(spark, sf_dir, "events").withColumn("user_id", F.lit(1))
        rolling_median(
            ev, "user_id", ["ts", "event_id"], "value", w=101,
            method="order_statistic",
        ).count()

    probe(
        "rolling_median_wide_hot_key",
        lambda: hot_rolling(SMALL),
        lambda: hot_rolling(BIG),
    )

    print("| op | sf0.1 s | sf1 s | ratio |")
    print("|---|---|---|---|")
    for k, v in out["ops"].items():
        if "sf0.1_s" in v:
            print(f"| {k} | {v['sf0.1_s']:.3f} | {v['sf1_s']:.3f} | {v['ratio']:.1f}x |")
        else:
            print(f"| {k} | {v['stale_quantizer_s']:.3f} | {v['requantized_s']:.3f} | {v['ratio']:.2f}x |")
    with open("SCALE_PROBE_r08.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
