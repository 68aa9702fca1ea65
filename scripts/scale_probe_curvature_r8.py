"""Curvature check for the round-8 curation additions: sf0.1 → sf1 →
sf2 (10× and 20× rows). One 10× point can't separate "linear with
fixed costs" from the onset of a super-linear term; the second
doubling can: a linear operator costs ≤ ~2× from sf1 to sf2, a
quadratic one ~4×.

Targets are the five costliest new queries (the 10× probe's worst
rows). Requires `.scale/sf1` and `.scale/sf2`
(scripts/make_scale_dataset.py, --mult 10 / --mult 20).

Usage: python scripts/scale_probe_curvature_r8.py → one JSON line + table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NAMES = [
    "corpus_dsir_select",
    "analytics_source_overlap",
    "training_curation_funnel",
    "text_nb_quality_filter",
    "pack_bins_harmonic",
]

POINTS = (
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", ".scale/sf1"),
    ("sf2", ".scale/sf2"),
)


def main() -> None:
    from tipoca_stream_spark.plans import QUERIES
    from tipoca_stream_spark.session import get_spark

    spark = get_spark("scale_probe_curvature_r8")
    spark.sparkContext.setLogLevel("ERROR")
    reps = int(os.environ.get("PROBE_REPS", "2"))
    # warm the Arrow python-UDF workers (first mapInPandas pays ~6 s setup)
    QUERIES["multimodal_mixed_features"].fn(spark, POINTS[0][1]).count()
    out: dict[str, dict[str, float]] = {}
    for name in NAMES:
        row: dict[str, float] = {}
        for label, sf in POINTS:
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                QUERIES[name].fn(spark, sf).count()
                best = min(best, time.perf_counter() - t0)
            row[label] = round(best, 3)
        row["r10"] = round(row["sf1"] / row["sf0.1"], 2)
        row["r20_over_10"] = round(row["sf2"] / row["sf1"], 2)
        out[name] = row
    print(json.dumps({"probe": "curvature_r8", "reps": reps, "rows": out}))
    w = max(len(n) for n in out)
    print(f"{'query'.ljust(w)}  sf0.1   sf1     sf2     10x    sf2/sf1")
    for name, r in out.items():
        print(
            f"{name.ljust(w)}  {r['sf0.1']:<6}  {r['sf1']:<6}  {r['sf2']:<6}"
            f"  {r['r10']:<5}  {r['r20_over_10']}"
        )


if __name__ == "__main__":
    main()
