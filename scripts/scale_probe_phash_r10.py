"""Curvature probe for the multimodal near-dup family (r10b): run the
fingerprint + banded-pair pipeline on synthetic documents tables of
5k / 10k / 20k / 50k rows (1x / 2x / 4x / 10x the sf0.1 corpus) and
record per-size wall time, distinct-fingerprint count, and pair count.

The claim under test (SCALE.md "near-dup family's scale shape"): the
candidate/verify work is bounded by the DISTINCT fingerprint set and
the output by the true pair set, so doubling the corpus should roughly
double wall time (fingerprinting + expansion are linear; d grows with
the block count). A super-linear blowup here would mean the banding is
colliding wholesale again.

Writes SCALE_PROBE_r10_phash.json. Usage:
    python scripts/scale_probe_phash_r10.py
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SIZES = [5000, 10000, 20000, 50000]


def main() -> None:
    from pyspark.sql import functions as F

    from tipoca_stream_spark.operators.audiofp import audio_fingerprints
    from tipoca_stream_spark.operators.phash import (
        phash_from_documents,
        phash_near_dups,
    )
    from tipoca_stream_spark.session import get_spark

    spark = get_spark("phash-scale-probe", shuffle_partitions=32)
    out: dict = {"probe": "phash_family_curvature", "sizes": {}}
    for n in SIZES:
        # synthetic documents: doc_id + a text whose BYTE LENGTH varies
        # (the image dims derive from it); same shape as the testdata
        docs = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("d"), F.expr("repeat('x', 20 + cast(id % 37 as int))")
            ).alias("text"),
        )
        row: dict = {}
        for name, build in (
            (
                "image",
                lambda d: phash_near_dups(
                    phash_from_documents(d).select("media_id", "phash"),
                    max_hamming=8,
                ),
            ),
            (
                "audio",
                lambda d: phash_near_dups(
                    audio_fingerprints(d).select("media_id", "fingerprint"),
                    max_hamming=8,
                    hash_col="fingerprint",
                ),
            ),
        ):
            build(docs).write.format("noop").mode("overwrite").save()  # warm
            best, pairs = float("inf"), -1
            for _ in range(2):
                t0 = time.perf_counter()
                build(docs).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            pairs = build(docs).count()
            row[name] = {"sec": round(best, 2), "pairs": int(pairs)}
        ph = phash_from_documents(docs)
        row["distinct_image_fps"] = ph.select("phash").distinct().count()
        out["sizes"][str(n)] = row
        print(json.dumps({n: row}), flush=True)
    # doubling ratios on wall time (image)
    secs = [out["sizes"][str(n)]["image"]["sec"] for n in SIZES]
    out["image_doubling_ratios"] = [
        round(b / a, 2) for a, b in zip(secs, secs[1:])
    ]
    with open(os.path.join(ROOT, "SCALE_PROBE_r10_phash.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
