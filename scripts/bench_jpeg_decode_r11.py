"""Round-11 JPEG batch-decode bench (VERDICT r10 next #3): the per-image
ctypes crossing + Python staging (marker walk, destuff, table numpy
builds, uint16 astype) was the decode floor after the fused scan. The
new ``decode_jpeg_batch`` moves the whole baseline decode for N images
into (at most) two C crossings with a batch-wide content-keyed Huffman
LUT cache and direct-uint8 color output.

Measures, all parity-asserted against per-image ``decode_jpeg``:
  1. board fixture (100 KB, restart-dense, fused-core-bound),
  2. small shared-table corpus (Python staging dominates),
  3. small per-image-table corpus (the worst single-path case: a fresh
     2^16-entry Python LUT build per image — real optimizing encoders
     emit per-image tables),
  4. the through-Spark aggregate (bench.py's image_decode stage shape:
     4096 board replicas, Arrow-batched mapInPandas on local[32]) —
     BENCH_r10's image_decode_mb_per_s = 205.9 is the number to move.

Usage: python scripts/bench_jpeg_decode_r11.py → BENCH_JPEG_r11.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def _best(fn, reps=5) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    import numpy as np

    from test_imagecodec import jpeg_encode  # the repo's own test encoder
    from tipoca_stream_spark.operators import imagecodec as ic

    out: dict = {"metric": "jpeg_batch_decode_r11"}
    with open(os.path.join(ROOT, "tests/fixtures/baseline_board.jpg"), "rb") as f:
        board = f.read()

    def corpus_row(name, payloads):
        refs = [ic.decode_jpeg(p) for p in payloads]
        outs = ic.decode_jpeg_batch(payloads)
        assert all(np.array_equal(a, b) for a, b in zip(refs, outs)), name
        nb = sum(len(p) for p in payloads)
        t_single = _best(lambda: [ic.decode_jpeg(p) for p in payloads])
        t_batch = _best(lambda: ic.decode_jpeg_batch(payloads))
        out[name] = {
            "n_images": len(payloads),
            "total_bytes": nb,
            "single_mb_per_s": round(nb / 1e6 / t_single, 2),
            "batch_mb_per_s": round(nb / 1e6 / t_batch, 2),
            "single_us_per_img": round(t_single / len(payloads) * 1e6, 1),
            "batch_us_per_img": round(t_batch / len(payloads) * 1e6, 1),
            "speedup": round(t_single / t_batch, 2),
        }
        print(json.dumps({name: out[name]}), flush=True)

    corpus_row("board_fixture", [board] * 32)

    rng = np.random.default_rng(11)
    base_px = rng.integers(0, 256, size=(32, 40, 3))
    corpus_row("small_shared_tables", [jpeg_encode(base_px)[0]] * 256)

    per_img = []
    for i in range(256):
        px = rng.integers(0, 256, size=(24 + i % 3 * 8, 24 + i % 5 * 8, 3))
        per_img.append(jpeg_encode(px, chroma_sub=(2, 2) if i % 2 else (1, 1))[0])
    corpus_row("small_per_image_tables", per_img)

    # --- through-Spark aggregate (bench.py's image_decode stage) --------
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from tipoca_stream_spark.session import get_spark

    spark = get_spark("bench-jpeg-r11")
    n_img = 4096
    n_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    img_df = (
        spark.range(n_img)
        .repartition(n_cpus)
        .select(F.col("id"), F.lit(board).alias("payload"))
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("px_sum", T.LongType())]
    )

    def run(batched: bool):
        def gen(batches):
            from tipoca_stream_spark.operators.imagecodec import (
                decode_jpeg,
                decode_jpeg_batch,
            )

            for pdf in batches:
                if batched:
                    imgs = decode_jpeg_batch([bytes(p) for p in pdf["payload"]])
                else:
                    imgs = [decode_jpeg(bytes(p)) for p in pdf["payload"]]
                yield pd.DataFrame(
                    [(int(i), int(m.sum())) for i, m in zip(pdf["id"], imgs)],
                    columns=["id", "px_sum"],
                )

        img_df.mapInPandas(gen, schema).agg(F.sum("px_sum")).collect()

    run(True)  # warm: per-worker .so load
    for batched, key in ((True, "spark_batch"), (False, "spark_single")):
        t = _best(lambda b=batched: run(b), reps=3)
        out[key] = {
            "image_decode_mb_per_s": round(n_img * len(board) / 1e6 / t, 1),
            "images_per_s": round(n_img / t, 1),
        }
        print(json.dumps({key: out[key]}), flush=True)
    out["r10_reference_mb_per_s"] = 205.9

    # small-image aggregate: 64k 3 KB images (the corpus-shaped case the
    # staging tax dominated; board replicas are fused-core/bandwidth
    # bound at 32 threads, hiding the per-image win)
    n_small = 65536
    small_payload = jpeg_encode(base_px)[0]
    small_df = (
        spark.range(n_small)
        .repartition(n_cpus)
        .select(F.col("id"), F.lit(small_payload).alias("payload"))
    )

    def run_small(batched: bool):
        def gen(batches):
            from tipoca_stream_spark.operators.imagecodec import (
                decode_jpeg,
                decode_jpeg_batch,
            )

            for pdf in batches:
                if batched:
                    imgs = decode_jpeg_batch([bytes(p) for p in pdf["payload"]])
                else:
                    imgs = [decode_jpeg(bytes(p)) for p in pdf["payload"]]
                yield pd.DataFrame(
                    [(int(i), int(m.sum())) for i, m in zip(pdf["id"], imgs)],
                    columns=["id", "px_sum"],
                )

        small_df.mapInPandas(gen, schema).agg(F.sum("px_sum")).collect()

    run_small(True)
    for batched, key in ((True, "spark_small_batch"), (False, "spark_small_single")):
        t = _best(lambda b=batched: run_small(b), reps=3)
        out[key] = {
            "images_per_s": round(n_small / t, 1),
            "mb_per_s": round(n_small * len(small_payload) / 1e6 / t, 1),
        }
        print(json.dumps({key: out[key]}), flush=True)
    spark.stop()

    with open(os.path.join(ROOT, "BENCH_JPEG_r11.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
