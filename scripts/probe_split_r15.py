"""Round-15 measurement probe: split a query's wall time into
(a) DataFrame construction (Python + py4j expression building),
(b) analysis/optimization (explain cost — plan-side),
(c) execution (min-of-3) — noop sink by default, count with FORCE=count
    (bench.py forces the tpch family and most extras with count()).

Also dumps .explain('formatted') to plans/r15/<q>_<tag>.txt with
PROBE_TAG=<tag> (default: skip the dump with PROBE_TAG=none).

Usage: [FORCE=count] [PROBE_TAG=before] python scripts/probe_split_r15.py q1 q2 ...
       python scripts/probe_split_r15.py tpch        # the whole family
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = os.environ.get("PROBE_TAG", "none")
    force = os.environ.get("FORCE", "noop")
    reps = int(os.environ.get("REPS", "3"))

    from tipoca_stream_spark.plans import QUERIES
    from tipoca_stream_spark.session import get_spark

    names: list[str] = []
    for a in sys.argv[1:]:
        if a == "tpch":
            names.extend(sorted(q for q in QUERIES if q.startswith("tpch_")))
        else:
            names.append(a)

    spark = get_spark("probe_split_r15")
    plans_dir = os.path.join(ROOT, "plans", "r15")
    os.makedirs(plans_dir, exist_ok=True)

    # warm as bench.py does
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    for warm in ("m2_dedupe_latest", "agg_pricing_summary"):
        QUERIES[warm].fn(spark, sf_dir).count()

    def run_once(df):
        if force == "count":
            df.count()
        else:
            df.write.format("noop").mode("overwrite").save()

    out = {}
    for name in names:
        qdef = QUERIES[name]
        t0 = time.perf_counter()
        df = qdef.fn(spark, sf_dir)
        t_construct = time.perf_counter() - t0

        t0 = time.perf_counter()
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        t_explain = time.perf_counter() - t0
        if tag != "none":
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as fh:
                fh.write(buf.getvalue())

        # second construction (memo-warm) — what a bench rep actually pays
        t0 = time.perf_counter()
        qdef.fn(spark, sf_dir)
        t_construct2 = time.perf_counter() - t0

        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            run_once(qdef.fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        out[name] = {
            "construct1": round(t_construct, 3),
            "construct2": round(t_construct2, 3),
            "explain": round(t_explain, 3),
            f"{force}_min{reps}": round(best, 3),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print("PROBE_SPLIT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
