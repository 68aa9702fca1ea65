"""Round-10 JPEG decode-throughput A/B (VERDICT r9 next #2, target ≥3×
over r9's 1.91/2.13 MB/s): the round-9 decoder (compiled entropy scan,
numpy einsum IDCT + transpose assembly + numpy BT.601, per-image Huffman
LUT builds) vs the round-10 decoder (same entropy scan + compiled
fused IDCT/assembly and color units + content-cached Huffman LUTs) on
the two independently-encoded board fixtures.

Outputs are asserted BIT-IDENTICAL between the two rounds (the r10 C
units reproduce the numpy chain's summation order exactly; no digest
regeneration this round) and between the current decoder's native and
pure-Python paths.

Usage: python scripts/bench_jpeg_decode_r10.py → BENCH_JPEG_r10.json.
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

R9_SHA = "6142f02"  # round-9 close


def _load(path: str, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec)
    sys.modules[name] = m
    spec.loader.exec_module(m)
    return m


def _best_of(fn, payload, reps: int = 15) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(payload)
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from tipoca_stream_spark.operators import imagecodec as new

    old_src = subprocess.run(
        ["git", "-C", ROOT, "show",
         f"{R9_SHA}:tipoca_stream_spark/operators/imagecodec.py"],
        capture_output=True, text=True, check=True,
    ).stdout
    old_path = "/tmp/imagecodec_r9_ab.py"
    with open(old_path, "w") as f:
        f.write(old_src)
    old = _load(old_path, "imagecodec_r9_ab")

    fixtures = {
        "baseline_board": "tests/fixtures/baseline_board.jpg",
        "progressive_board": "tests/fixtures/progressive_board.jpg",
    }
    out: dict = {
        "native_available": new._native_entropy() is not None,
        "r9_baseline_mb_per_s": 1.91,
        "r9_progressive_mb_per_s": 2.13,
        "fixtures": {},
    }
    for name, rel in fixtures.items():
        with open(os.path.join(ROOT, rel), "rb") as f:
            payload = f.read()
        a = old.decode_jpeg(payload)
        b = new.decode_jpeg(payload)
        assert (a == b).all(), name  # r10 must be bit-identical to r9
        # pure-python side of the current decoder (LUT, no C)
        saved, new._NATIVE = new._NATIVE, None
        try:
            c = new.decode_jpeg(payload)
            t_pure = _best_of(new.decode_jpeg, payload)
        finally:
            new._NATIVE = saved
        assert (b == c).all(), name  # native == pure, bit-exact
        t_old = _best_of(old.decode_jpeg, payload)
        t_new = _best_of(new.decode_jpeg, payload)
        mb = len(payload) / 1e6
        out["fixtures"][name] = {
            "bytes": len(payload),
            "r9_ms": round(t_old * 1000, 2),
            "r10_ms": round(t_new * 1000, 2),
            "r10_pure_python_ms": round(t_pure * 1000, 2),
            "speedup_vs_r9": round(t_old / t_new, 2),
            "native_over_pure": round(t_pure / t_new, 2),
            "r10_mb_per_s": round(mb / t_new, 2),
            "pixels_changed_vs_r9": 0,
        }
    path = os.path.join(ROOT, "BENCH_JPEG_r10.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
