"""Third-doubling curvature check (VERDICT r8 next #5): sf0.1 → sf1 →
sf2 → sf4 (10× / 20× / 40× rows) for the heaviest linear rows — DSIR
selection, source overlap — plus the triangle plan. Round 8 established
linearity through sf2; the sf4 point checks that no memory/spill cliff
appears as the shuffle working set doubles again (a linear operator
stays ≤ ~2.1× per doubling; a spill onset shows as a jump well past 2×
between consecutive doublings even though the algorithm is linear).

Each SF point runs in a FRESH JVM (subprocess): the first run shared one
16 GiB JVM across all points and died of cumulative heap pressure at
sf4 — earlier points' localCheckpoint blocks are freed by the
ContextCleaner only after their RDDs are GC'd, which lazily trails the
allocation spike of the next point's wedge join. One JVM per point makes
every measurement independent (the bench_ab discipline) and is itself
the honest deployment analogue: a real cluster job doesn't carry a
previous job's block manager state.

Requires `.scale/sf1`, `.scale/sf2`, `.scale/sf4`
(scripts/make_scale_dataset.py --mult 10 / 20 / 40).

Usage: python scripts/scale_probe_curvature_r9.py
→ SCALE_PROBE_r09_curvature.json + one JSON line + table.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NAMES = [
    "corpus_dsir_select",
    "analytics_source_overlap",
    "graph_triangle_counts",
]

POINTS = (
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", ".scale/sf1"),
    ("sf2", ".scale/sf2"),
    ("sf4", ".scale/sf4"),
)

_POINT_SCRIPT = """
import json, sys, time
sys.path.insert(0, {root!r})
from tipoca_stream_spark.plans import QUERIES
from tipoca_stream_spark.session import get_spark
spark = get_spark("curvature_r9_point")
spark.sparkContext.setLogLevel("ERROR")
out = {{}}
for name in {names!r}:
    best = float("inf")
    for _ in range({reps}):
        t0 = time.perf_counter()
        QUERIES[name].fn(spark, {sf!r}).count()
        best = min(best, time.perf_counter() - t0)
    out[name] = round(best, 3)
print("POINT_RESULT " + json.dumps(out))
spark.stop()
"""


def main() -> None:
    reps = int(os.environ.get("PROBE_REPS", "2"))
    per_point: dict[str, dict[str, float]] = {}
    for label, sf in POINTS:
        proc = subprocess.run(
            [sys.executable, "-c",
             _POINT_SCRIPT.format(root=ROOT, names=NAMES, reps=reps, sf=sf)],
            capture_output=True,
            text=True,
            cwd=ROOT,
        )
        line = next(
            (ln for ln in proc.stdout.splitlines()
             if ln.startswith("POINT_RESULT ")),
            None,
        )
        if proc.returncode != 0 or line is None:
            raise RuntimeError(
                f"point {label} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
            )
        per_point[label] = json.loads(line[len("POINT_RESULT "):])
    out: dict[str, dict[str, float]] = {}
    for name in NAMES:
        row = {label: per_point[label][name] for label, _ in POINTS}
        row["r10"] = round(row["sf1"] / row["sf0.1"], 2)
        row["d2"] = round(row["sf2"] / row["sf1"], 2)  # second doubling
        row["d3"] = round(row["sf4"] / row["sf2"], 2)  # third doubling
        out[name] = row
    res = {
        "probe": "curvature_r9",
        "reps": reps,
        "isolation": "fresh JVM per SF point",
        "rows": out,
    }
    with open(os.path.join(ROOT, "SCALE_PROBE_r09_curvature.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
    w = max(len(n) for n in out)
    print(f"{'query'.ljust(w)}  sf0.1   sf1     sf2     sf4     10x    d2     d3")
    for name, r in out.items():
        print(
            f"{name.ljust(w)}  {r['sf0.1']:<6}  {r['sf1']:<6}  {r['sf2']:<6}"
            f"  {r['sf4']:<6}  {r['r10']:<5}  {r['d2']:<5}  {r['d3']}"
        )


if __name__ == "__main__":
    main()
