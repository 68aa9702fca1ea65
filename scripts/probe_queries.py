"""Measure named registry queries at two scale factors and print the
SCALE.md markdown rows (min-of-N, the bench.py discipline).

Usage:
    python scripts/probe_queries.py q1 q2 ...            # sf0.1 vs .scale/sf1
    SMALL=/root/testdata/sf0.01 BIG=/root/testdata/sf0.1 \\
        python scripts/probe_queries.py q1 q2

Regenerate the big dataset first if needed:
    python scripts/make_scale_dataset.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(names: list[str]) -> None:
    small = os.environ.get("SMALL", "/root/testdata/sf0.1")
    big = os.environ.get("BIG", "/root/repo/.scale/sf1")
    reps = int(os.environ.get("REPS", "2"))

    from tipoca_stream_spark.plans import QUERIES
    from tipoca_stream_spark.session import get_spark

    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark("probe_queries")
    spark.read.parquet(f"{small}/lineitem.parquet").count()  # warm JVM

    def best_of(run) -> float:
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    res: dict[str, dict[str, float]] = {}
    for sf_dir, key in [(small, "small"), (big, "big")]:
        for name in names:
            qdef = QUERIES[name]
            res.setdefault(name, {})[key] = best_of(
                lambda: qdef.fn(spark, sf_dir).count()
            )
    print(f"| query | {os.path.basename(small)} s | {os.path.basename(big)} s | ratio |")
    print("|---|---|---|---|")
    for name, d in res.items():
        # a sub-millisecond small-side timing rounds to 0.0 — don't lose
        # the whole run to a ZeroDivisionError at print time
        ratio = f"{d['big'] / d['small']:.1f}x" if d["small"] > 0 else "n/a"
        print(f"| {name} | {d['small']:.3f} | {d['big']:.3f} | {ratio} |")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
