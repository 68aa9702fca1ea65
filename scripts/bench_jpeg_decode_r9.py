"""Round-9 JPEG decode-throughput A/B (VERDICT r8 next #2): the round-8
decoder (commit 777f13b — per-bit Huffman reader, single-pass einsum
IDCT, byte-at-a-time destuffing) vs the round-9 decoder (16-bit-peek LUT
reader, compiled scan loop where a C compiler exists, shared two-pass
IDCT, slice-based destuffing) on a JPEG-bearing corpus, plus the
always-reproducible native-vs-pure ratio of the current decoder.

Corpus = the two independently-encoded board fixtures (real libjpeg
marker layout, 477x720) decoded repeatedly — the baseline one is the
format a 100 TB image corpus is overwhelmingly made of. Outputs are
asserted bit-identical between every pair of decoders measured (old vs
new differs only on the 24 documented rounding-boundary pixels of the
baseline board, checked as |delta| <= 1).

Usage: python scripts/bench_jpeg_decode_r9.py → BENCH_JPEG_r9.json.
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

R8_SHA = "777f13b"  # round-8 close


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
    import numpy as np

    from tipoca_stream_spark.operators import imagecodec as new

    old_src = subprocess.run(
        ["git", "-C", ROOT, "show",
         f"{R8_SHA}:tipoca_stream_spark/operators/imagecodec.py"],
        capture_output=True, text=True, check=True,
    ).stdout
    old_path = "/tmp/imagecodec_r8_ab.py"
    with open(old_path, "w") as f:
        f.write(old_src)
    old = _load(old_path, "imagecodec_r8_ab")

    fixtures = {
        "baseline_board": "tests/fixtures/baseline_board.jpg",
        "progressive_board": "tests/fixtures/progressive_board.jpg",
    }
    out: dict = {
        "native_available": new._native_entropy() is not None,
        "fixtures": {},
    }
    for name, rel in fixtures.items():
        with open(os.path.join(ROOT, rel), "rb") as f:
            payload = f.read()
        a = old.decode_jpeg(payload)
        b = new.decode_jpeg(payload)
        delta = np.abs(a.astype(int) - b.astype(int))
        assert delta.max() <= 1, name  # rounding-boundary pixels only
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
            "r8_ms": round(t_old * 1000, 2),
            "r9_ms": round(t_new * 1000, 2),
            "r9_pure_python_ms": round(t_pure * 1000, 2),
            "speedup_vs_r8": round(t_old / t_new, 2),
            "native_over_pure": round(t_pure / t_new, 2),
            "r9_mb_per_s": round(mb / t_new, 2),
            "pixels_changed_vs_r8": int((delta != 0).sum()),
        }
    path = os.path.join(ROOT, "BENCH_JPEG_r9.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
