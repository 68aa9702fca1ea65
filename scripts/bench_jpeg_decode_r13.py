"""Round-13 destuff-fusion A/B (VERDICT r12 next #6 / handoff #2): the
batch decoder's per-image two-pass entropy handling (destuff_c
malloc+copy, then the bitreader's second pass) is fused into the
bitreader (jpeg_decode_scan_fused_raw) — one pass over entropy bytes.
The uint8-plane lever was measured-dead (BENCH_JPEG_r12.json); fewer
passes was the named next honest ceiling lever.

ABBA protocol (the r12 experiment's model): alternate the committed
two-pass build against the fused working tree x N rounds, each
measurement in a FRESH subprocess (its own .so, keyed by source hash),
measuring
  - the restart-dense board fixture (32 replicas, single-core ms/img),
  - a 512-image 64x80 color corpus (us/img),
  - a 512-image 64x80 grayscale corpus (us/img),
with parity asserted against per-image decode_jpeg inside every run.
The through-Spark board aggregate (bench.py's image_decode stage) runs
once per variant at the end (minutes-scale, so not ABBA'd; loadavg
recorded per run).

Usage: python scripts/bench_jpeg_decode_r13.py -> BENCH_JPEG_r13.json
(run from a tree where tipoca_stream_spark/operators/imagecodec.py is
the FUSED version and git HEAD holds the two-pass one).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TARGET = os.path.join(ROOT, "tipoca_stream_spark/operators/imagecodec.py")

MEASURE = r"""
import json, os, sys, time
sys.path.insert(0, %(root)r)
sys.path.insert(0, os.path.join(%(root)r, "tests"))
import numpy as np
from test_imagecodec import jpeg_encode
from tipoca_stream_spark.operators import imagecodec as ic

assert ic._native_lib() is not None, "C path required"

def best(fn, reps=5):
    b = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); fn(); b = min(b, time.perf_counter() - t0)
    return b

out = {"loadavg": [round(x, 2) for x in os.getloadavg()]}
with open(os.path.join(%(root)r, "tests/fixtures/baseline_board.jpg"), "rb") as f:
    board = f.read()

rng = np.random.default_rng(13)
color = [jpeg_encode(rng.integers(0, 256, size=(64, 80, 3)),
                     chroma_sub=(2, 2))[0] for _ in range(64)] * 8
gray = [jpeg_encode(rng.integers(0, 256, size=(64, 80)))[0]
        for _ in range(64)] * 8

# parity inside the measured build
for name, corpus in (("board", [board] * 4), ("color", color[:32]),
                     ("gray", gray[:32])):
    refs = [ic.decode_jpeg(p) for p in corpus]
    outs = ic.decode_jpeg_batch(corpus)
    assert all(np.array_equal(a, b) for a, b in zip(refs, outs)), name

boards = [board] * 32
t = best(lambda: ic.decode_jpeg_batch(boards))
out["board_ms_per_img"] = round(t / len(boards) * 1e3, 3)
out["board_mb_per_s"] = round(len(board) * len(boards) / 1e6 / t, 1)
t = best(lambda: ic.decode_jpeg_batch(color))
out["color_us_per_img"] = round(t / len(color) * 1e6, 1)
t = best(lambda: ic.decode_jpeg_batch(gray))
out["gray_us_per_img"] = round(t / len(gray) * 1e6, 1)
print("RESULT " + json.dumps(out))
"""

SPARK_MEASURE = r"""
import json, os, sys, time
sys.path.insert(0, %(root)r)
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from tipoca_stream_spark.session import get_spark

with open(os.path.join(%(root)r, "tests/fixtures/baseline_board.jpg"), "rb") as f:
    board = f.read()
spark = get_spark("bench-jpeg-r13")
n_img = 4096
n_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
img_df = (spark.range(n_img).repartition(n_cpus)
          .select(F.col("id"), F.lit(board).alias("payload")))
schema = T.StructType([T.StructField("id", T.LongType()),
                       T.StructField("px_sum", T.LongType())])

def run():
    def gen(batches):
        from tipoca_stream_spark.operators.imagecodec import decode_jpeg_batch
        for pdf in batches:
            imgs = decode_jpeg_batch([bytes(p) for p in pdf["payload"]])
            yield pd.DataFrame(
                [(int(i), int(m.sum())) for i, m in zip(pdf["id"], imgs)],
                columns=["id", "px_sum"])
    img_df.mapInPandas(gen, schema).agg(F.sum("px_sum")).collect()

run()  # warm
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter(); run(); best = min(best, time.perf_counter() - t0)
out = {"spark_mb_per_s": round(n_img * len(board) / 1e6 / best, 1),
       "loadavg": [round(x, 2) for x in os.getloadavg()]}
print("RESULT " + json.dumps(out))
"""


def run_measure(script: str) -> dict:
    r = subprocess.run([sys.executable, "-c", script % {"root": ROOT}],
                       capture_output=True, text=True, timeout=1200)
    for line in r.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(f"no RESULT line:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}")


def main() -> None:
    with open(TARGET) as f:
        fused_src = f.read()
    before_src = subprocess.run(
        ["git", "-C", ROOT, "show", "HEAD:tipoca_stream_spark/operators/imagecodec.py"],
        capture_output=True, text=True, check=True).stdout
    assert "jpeg_decode_scan_fused_raw" in fused_src
    assert "jpeg_decode_scan_fused_raw" not in before_src, \
        "HEAD already contains the fusion; point 'before' elsewhere"

    variants = {"before_twopass": before_src, "after_fused": fused_src}
    results = {k: [] for k in variants}
    try:
        for rnd in range(3):
            order = (["after_fused", "before_twopass"] if rnd % 2 == 0
                     else ["before_twopass", "after_fused"])
            for name in order:
                with open(TARGET, "w") as f:
                    f.write(variants[name])
                row = run_measure(MEASURE)
                results[name].append(row)
                print(json.dumps({name: row}), flush=True)
        spark_rows = {}
        for name in ("before_twopass", "after_fused"):
            with open(TARGET, "w") as f:
                f.write(variants[name])
            spark_rows[name] = run_measure(SPARK_MEASURE)
            print(json.dumps({f"spark_{name}": spark_rows[name]}), flush=True)
    finally:
        with open(TARGET, "w") as f:
            f.write(fused_src)

    def med(name, key):
        xs = sorted(r[key] for r in results[name])
        return xs[len(xs) // 2]

    record = {
        "metric": "jpeg_destuff_fusion_r13",
        "verdict_item": "VERDICT r12 next #6: fuse destuff into the bitreader",
        "abba_rounds": results,
        "spark_aggregate": spark_rows,
        "medians": {
            k: {
                "board_ms_per_img": med(k, "board_ms_per_img"),
                "color_us_per_img": med(k, "color_us_per_img"),
                "gray_us_per_img": med(k, "gray_us_per_img"),
            }
            for k in results
        },
    }
    b, a = record["medians"]["before_twopass"], record["medians"]["after_fused"]
    record["ratios_after_over_before"] = {
        k: round(a[k] / b[k], 3) for k in a
    }
    with open(os.path.join(ROOT, "BENCH_JPEG_r13.json"), "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record["medians"]))
    print(json.dumps(record["ratios_after_over_before"]))


if __name__ == "__main__":
    main()
