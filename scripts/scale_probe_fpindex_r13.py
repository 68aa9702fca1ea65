"""Round-13 probe: fingerprint-index bucket PRUNING at its design point
(VERDICT r12 wrong #3). The r12 probe (SCALE_PROBE_r12_fpindex.json)
showed flat screen latency across a 16x corpus but every row read
files_scanned == files_total == 32: at batch=1000 x 9 pigeonhole bands
the ~9,000 band keys hash into ALL 32 default buckets, so the documented
"screen reads only the batch's band buckets" pruning never actually
pruned in the committed evidence. The mechanism that matters for a
streaming ingest at realistic micro-batch sizes (tens-hundreds of docs)
is file pruning — and it needs a committed row where
files_scanned << files_total.

Method: ONE corpus (40k well-separated random fingerprints) ingested
into an index with index_buckets=256, compacted (one file per non-empty
bucket, so files_scanned/files_total ~ touched/total buckets); then
screen batches of 1 / 5 / 10 / 50 / 200 / 1000 fingerprints (min-of-3
latency) and record scanned-vs-total per batch size. Expected scanned
~= 256 * (1 - (1 - 1/256)^(9 * batch)) — i.e. O(batch) until the bucket
space saturates, independent of the corpus.

Writes SCALE_PROBE_r13_fpindex.json.
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

CORPUS = 40_000
INGEST_CHUNK = 10_000
BUCKETS = 256
BATCHES = [1, 5, 10, 50, 200, 1000]


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

    spark = get_spark("fpindex-prune-probe", shuffle_partitions=16)

    def df(rows):
        return spark.createDataFrame(rows, ["media_id", "phash"]).withColumn(
            "media_id", F.col("media_id").cast("long")
        )

    rng = random.Random(130)
    seen: set = set()
    probe_fps = rand_fps(rng, max(BATCHES), seen)

    root = f"/tmp/fpprobe_r13_{BUCKETS}"
    shutil.rmtree(root, ignore_errors=True)
    idx = IncrementalFingerprintIndex(
        spark, root, max_hamming=8, index_buckets=BUCKETS
    )
    t0 = time.time()
    nid = 0
    for start in range(0, CORPUS, INGEST_CHUNK):
        n = min(INGEST_CHUNK, CORPUS - start)
        fps = rand_fps(rng, n, seen)
        idx.ingest(df([(nid + k, fp) for k, fp in enumerate(fps)]), dedup=False)
        nid += n
    t_ingest = time.time() - t0
    idx.index.compact()

    record: dict = {
        "metric": "fpindex_files_scanned_vs_batch",
        "corpus_fps": CORPUS,
        "index_buckets": BUCKETS,
        "ingest_s": round(t_ingest, 1),
        "rows": [],
    }
    for bsz in BATCHES:
        batch = df([(10**9 + k, fp) for k, fp in enumerate(probe_fps[:bsz])])
        idx.screen(batch).count()  # warm
        t_screen = min(
            (lambda s: (idx.screen(batch).count(), time.time() - s)[1])(time.time())
            for _ in range(3)
        )
        st = idx.last_screen_stats
        row = {
            "batch_fps": bsz,
            "screen_s_min3": round(t_screen, 2),
            "files_scanned": st.get("files_scanned"),
            "files_total": st.get("files_total"),
            "scan_fraction": round(
                st.get("files_scanned", 0) / max(st.get("files_total", 1), 1), 3
            ),
            "bound_9x_batch": 9 * bsz,
        }
        record["rows"].append(row)
        print(json.dumps(row), flush=True)
    shutil.rmtree(root, ignore_errors=True)

    small = record["rows"][0]
    record["summary"] = {
        "claim": "screen reads O(batch) files: scanned tracks the batch's "
                 "band keys (<= 9 x batch), not the corpus",
        "batch1_scan_fraction": small["scan_fraction"],
        "pruned_rows": sum(
            1 for r in record["rows"] if r["files_scanned"] < r["files_total"]
        ),
    }
    with open(os.path.join(ROOT, "SCALE_PROBE_r13_fpindex.json"), "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record["summary"]))


if __name__ == "__main__":
    main()
