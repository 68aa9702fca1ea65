"""Dump .explain('formatted') for round-15 touched queries, tagged
before/after. The 'before' side runs against the r15base worktree via
argv[1] (package root); plans always land in the MAIN repo's plans/r15/.

Usage:
    python scripts/probe_plans_r15.py <pkg_root> <tag> query [query ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    pkg_root = os.path.abspath(sys.argv[1])
    tag = sys.argv[2]
    names = sys.argv[3:]
    sys.path.insert(0, pkg_root)

    from tipoca_stream_spark.plans import QUERIES
    from tipoca_stream_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe_plans_r15")
    out_dir = os.path.join(ROOT, "plans", "r15")
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
