"""Round-8 scale probe for the tokenizer/packing family: sf0.1 vs
.scale/sf1 (10× documents, 10× tokens; vocabulary is near-constant —
the heavy-tailed regime the BPE design assumes).

Rows and what they should show:

- ``bpe_word_freq`` — the ONLY corpus-sized training stage (explode →
  map-side-combined groupBy). Should scale ≈ linearly with tokens.
- ``bpe_train`` — full training (16 merges). The iteration runs on the
  aggregated vocabulary, so the 10× corpus should cost ~the same as the
  word-frequency aggregate plus a constant: ratio well under 10×.
- ``bpe_segment_pack`` — segment + fixed-length packing to 128-token
  sequences. Linear stages (Arrow encode UDF, slice fan-out, chunk-id
  shuffle); expect ≈ linear.
- ``bpe_segment_pack_spans`` — same plus the per-chunk document-span
  metadata; should track ``bpe_segment_pack`` (the spans ride the same
  shuffle).
- ``pipeline_e2e`` — the training_pipeline_pack chain end to end MINUS
  the gopher gate: the scale dataset's replica texts are token-salted
  (scripts/make_scale_dataset.py — so pair-family output scales
  linearly), which leaves no stopwords and fails the gate for the WHOLE
  corpus — a property of the synthetic scale set, not the operator.
  The probed chain is exact-dedup keepers → deterministic split →
  BPE train → segment → pack: the same plan with one semi-join fewer.
  (Probing the gate-on query here also surfaced a real robustness bug,
  now fixed + pinned: packing an EMPTY corpus failed analysis on a
  zero-entry create_map base-offset literal.)

Usage: python scripts/scale_probe_bpe_pack.py  → one JSON line + table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SMALL = "/root/testdata/sf0.1"
BIG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale/sf1"
)


def best_of(reps, run):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def _docs(spark, sf_dir):
    from tipoca_stream_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    if docs.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism:
        docs = docs.repartition(spark.sparkContext.defaultParallelism)
    return docs.select("doc_id", "text")


def main() -> None:
    from tipoca_stream_spark.operators import bpe, packing
    from tipoca_stream_spark.session import get_spark

    spark = get_spark("scale_probe_bpe_pack")
    spark.sparkContext.setLogLevel("ERROR")
    reps = int(os.environ.get("PROBE_REPS", "2"))
    out: dict[str, dict[str, float]] = {}

    merges_by_sf: dict[str, list] = {}
    for label, sf in (("sf0.1", SMALL), ("sf1", BIG)):
        docs = _docs(spark, sf).localCheckpoint()

        out.setdefault("bpe_word_freq", {})[label] = best_of(
            reps, lambda: bpe.word_frequencies(docs).count()
        )
        out.setdefault("bpe_train", {})[label] = best_of(
            reps,
            lambda: bpe.train_bpe(docs, num_merges=16, min_pair_count=2),
        )
        merges_by_sf[label] = bpe.train_bpe(docs, num_merges=16, min_pair_count=2)

        def seg_pack():
            seg = bpe.segment_with_merges(docs, merges_by_sf[label])
            return packing.pack_sequences(seg, 128).count()

        out.setdefault("bpe_segment_pack", {})[label] = best_of(reps, seg_pack)

        def seg_pack_spans():
            seg = bpe.segment_with_merges(docs, merges_by_sf[label])
            return packing.pack_sequences_with_spans(seg, 128).count()

        out.setdefault("bpe_segment_pack_spans", {})[label] = best_of(
            reps, seg_pack_spans
        )

        def e2e():
            from pyspark.sql import functions as F

            from tipoca_stream_spark.operators import corpus_dedup as cd
            from tipoca_stream_spark.plans.sampling import (
                EVAL_PCT,
                SPLIT_SALT,
                _bucket,
            )
            from tipoca_stream_spark.plans.training import (
                BPE_MIN_PAIR_COUNT,
                BPE_NUM_MERGES,
                PACK_SEQ_LEN,
            )

            keepers = cd.exact_dedup_groups(docs, "text", "doc_id").select(
                F.col("keeper_id").alias("doc_id")
            )
            curated = (
                docs.join(keepers, "doc_id", "left_semi")
                .filter(_bucket(F.col("doc_id"), SPLIT_SALT) >= EVAL_PCT)
                .select("doc_id", "text")
            )
            merges = bpe.train_bpe(
                curated,
                num_merges=BPE_NUM_MERGES,
                min_pair_count=BPE_MIN_PAIR_COUNT,
            )
            seg = bpe.segment_with_merges(curated, merges)
            return packing.pack_sequences(seg, PACK_SEQ_LEN).count()

        out.setdefault("pipeline_e2e", {})[label] = best_of(reps, e2e)

    rows = []
    for name, d in out.items():
        ratio = round(d["sf1"] / d["sf0.1"], 2) if d["sf0.1"] else None
        rows.append({"probe": name, **d, "ratio_at_10x": ratio})
    print(json.dumps({"probe": "bpe_pack_r8", "rows": rows}))
    print(f"{'probe':26s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>6s}")
    for r in rows:
        print(
            f"{r['probe']:26s} {r['sf0.1']:8.2f} {r['sf1']:8.2f} "
            f"{r['ratio_at_10x']:6.2f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
