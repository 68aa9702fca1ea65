"""Scale probe for the round-12 maintained fingerprint index: the claim
under test (SCALE.md) is that a SCREEN's cost is governed by the batch,
not the corpus — candidates come from a band equi-join between the
batch's distinct fingerprints and only the TOUCHED index buckets'
files, so growing the ingested corpus 16x should move screen latency
far less than 16x (ideally ~flat once per-query overhead dominates).

Method: build three indexes at 10k / 40k / 160k distinct fingerprints
(well-separated random 64-bit strings, compacted after build), then
screen the SAME fixed 1,000-fingerprint batch against each, min-of-3.
Also records files_scanned/files_total per screen (the pruning
evidence) and the per-corpus ingest cost per fingerprint (O(batch)
appends should keep cost-per-fp roughly flat as the index grows).

Writes SCALE_PROBE_r12_fpindex.json.
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

SIZES = [10_000, 40_000, 160_000]
BATCH = 1_000
INGEST_CHUNK = 10_000


def rand_fps(rng: random.Random, n: int, seen: set) -> list[str]:
    out = []
    while len(out) < n:
        fp = "".join(rng.choice("01") for _ in range(64))
        if fp in seen:
            continue
        seen.add(fp)
        out.append(fp)
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from tipoca_stream_spark.operators.incremental_fingerprint import (
        IncrementalFingerprintIndex,
    )
    from tipoca_stream_spark.session import get_spark

    spark = get_spark("fpindex-probe", shuffle_partitions=16)

    def df(rows):
        return spark.createDataFrame(rows, ["media_id", "phash"]).withColumn(
            "media_id", F.col("media_id").cast("long")
        )

    rng = random.Random(120)
    seen: set = set()
    batch_fps = rand_fps(rng, BATCH, seen)
    batch = df([(10**9 + k, fp) for k, fp in enumerate(batch_fps)])

    record: dict = {"metric": "fpindex_screen_vs_corpus_size",
                    "batch": BATCH, "sizes": SIZES, "rows": []}
    for size in SIZES:
        root = f"/tmp/fpprobe_r12_{size}"
        shutil.rmtree(root, ignore_errors=True)
        idx = IncrementalFingerprintIndex(spark, root, max_hamming=8)
        t0 = time.time()
        nid = 0
        corpus_seen: set = set(seen)
        for start in range(0, size, INGEST_CHUNK):
            n = min(INGEST_CHUNK, size - start)
            fps = rand_fps(rng, n, corpus_seen)
            idx.ingest(df([(nid + k, fp) for k, fp in enumerate(fps)]),
                       dedup=False)
            nid += n
        t_ingest = time.time() - t0
        idx.index.compact()
        idx.screen(batch).count()  # warm
        t_screen = min(
            (lambda s: (idx.screen(batch).count(), time.time() - s)[1])(time.time())
            for _ in range(3)
        )
        row = {
            "corpus_fps": size,
            "ingest_s": round(t_ingest, 1),
            "ingest_us_per_fp": round(t_ingest / size * 1e6, 1),
            "screen_s_min3": round(t_screen, 2),
            "files_scanned": idx.last_screen_stats.get("files_scanned"),
            "files_total": idx.last_screen_stats.get("files_total"),
        }
        record["rows"].append(row)
        print(json.dumps(row), flush=True)
        shutil.rmtree(root, ignore_errors=True)

    s = [r["screen_s_min3"] for r in record["rows"]]
    record["summary"] = {
        "corpus_growth": f"{SIZES[-1] // SIZES[0]}x",
        "screen_latency_ratio": round(s[-1] / s[0], 2),
        "claim": "screen cost governed by batch, not corpus",
    }
    with open(os.path.join(ROOT, "SCALE_PROBE_r12_fpindex.json"), "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record["summary"]))


if __name__ == "__main__":
    main()
