"""Dump .explain('formatted') for the round-14 touched NON-headline
queries, tagged before/after. The 'before' side runs against the
r13close worktree via PYTHONPATH (pass the package root as argv[1]);
plans always land in the MAIN repo's plans/r14/.

Usage:
    python scripts/probe_plans_extra_r14.py <pkg_root> <tag> [query ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES_DEFAULT = [
    "graph_triangle_counts",
    "analytics_part_cooccurrence",
    "window_rolling_median_wide",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_components",
    "dedup_incremental_minhash",
    "similarity_ivf_topk_nprobe",
    "similarity_neardup_pairs",
]


def main() -> None:
    pkg_root = os.path.abspath(sys.argv[1])
    tag = sys.argv[2]
    names = sys.argv[3:] or QUERIES_DEFAULT
    sys.path.insert(0, pkg_root)

    from tipoca_stream_spark.plans import QUERIES
    from tipoca_stream_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe_plans_extra_r14")
    out_dir = os.path.join(ROOT, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print(name, "->", f"{name}_{tag}.txt", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
