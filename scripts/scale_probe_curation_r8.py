"""Round-8 second-wave scale probe: the curation/audit queries added
after the worklist closed, sf0.1 vs .scale/sf1 (10× rows; token-salted
replicas, so vocabulary ~10× too — see scripts/make_scale_dataset.py).

Rows and what they should show:

- ``pack_bins_harmonic`` — one range-partition pass + a bounded driver
  read of per-(partition, class) counts + one groupBy. ≈ linear.
- ``text_nb_quality_filter`` — two explode→groupBy aggregates plus a
  broadcast score join. ≈ linear (the vocabulary side grows with the
  salted corpus but stays far under the token stream).
- ``corpus_dsir_select`` — same shape over a FIXED 4096-bucket feature
  space plus TakeOrderedAndProject. ≈ linear.
- ``text_perplexity_buckets`` — unigram scoring + one exact-percentile
  aggregate + broadcast bucket compare. ≈ linear.
- ``embed_matryoshka_recall`` — two codegen scans ending in partial
  top-K. ≈ linear.
- ``bpe_fertility_by_lang`` — bounded by the Arrow encode of the corpus
  (the registered BPE segmenter). ≈ linear.

Usage: python scripts/scale_probe_curation_r8.py → one JSON line + table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMALL = "/root/testdata/sf0.1"
BIG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale/sf1"
)

NAMES = [
    "pack_bins_harmonic",
    "text_nb_quality_filter",
    "corpus_dsir_select",
    "text_perplexity_buckets",
    "embed_matryoshka_recall",
    "bpe_fertility_by_lang",
    # second wave: audits, mixed-modality decode, funnel, epoch shuffle
    "analytics_source_overlap",
    "kmeans_lloyd_round2",
    "multimodal_mixed_features",
    "multimodal_audio_roundtrip",
    "corpus_shuffle_order",
    "training_curation_funnel",
]


def best_of(reps, run):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    from tipoca_stream_spark.plans import QUERIES
    from tipoca_stream_spark.session import get_spark

    spark = get_spark("scale_probe_curation_r8")
    spark.sparkContext.setLogLevel("ERROR")
    reps = int(os.environ.get("PROBE_REPS", "2"))
    out: dict[str, dict[str, float]] = {}
    # warm the Arrow python-UDF workers once (first-ever mapInPandas pays
    # ~6 s of worker spawn + numpy/pandas import; that's session setup,
    # not operator cost — measured both ways in SCALE.md)
    QUERIES["multimodal_mixed_features"].fn(spark, SMALL).count()
    for label, sf in (("sf0.1", SMALL), ("sf1", BIG)):
        spark.read.parquet(f"{sf}/documents.parquet").count()  # warm FS/JIT
        for name in NAMES:
            out.setdefault(name, {})[label] = best_of(
                reps, lambda name=name, sf=sf: QUERIES[name].fn(spark, sf).count()
            )
    for name, r in out.items():
        r["ratio"] = round(r["sf1"] / r["sf0.1"], 2) if r["sf0.1"] else None
    print(json.dumps({"probe": "curation_r8", "reps": reps, "rows": out}))
    w = max(len(n) for n in out)
    print(f"{'query'.ljust(w)}  sf0.1    sf1      ratio@10x")
    for name, r in out.items():
        print(f"{name.ljust(w)}  {r['sf0.1']:<7}  {r['sf1']:<7}  {r['ratio']}")


if __name__ == "__main__":
    main()
