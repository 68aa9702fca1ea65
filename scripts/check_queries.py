"""Fast per-query oracle check (round 14): exactly sweep_oracle.py's
compare semantics (rows + sorted columns + order-insensitive values rounded
to 6 decimals) but only for the queries named on the command line — the
optimization round's inner verification loop.

Usage: python scripts/check_queries.py [--sf SF_DIR] name [name ...]
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))

from sweep_oracle import normalize  # noqa: E402  (same-dir import)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    names = args
    if not names:
        print("no queries named", file=sys.stderr)
        sys.exit(2)

    import duckdb

    from tipoca_stream_spark.plans import QUERIES
    from tipoca_stream_spark.session import get_spark

    spark = get_spark("check-queries", shuffle_partitions=32)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")

    n_fail = 0
    for name in names:
        qdef = QUERIES[name]
        t0 = time.time()
        sdf = qdef.fn(spark, sf_dir)
        scols = sdf.columns
        srows = [r.asDict() for r in sdf.collect()]
        if qdef.oracle is None:
            print(f"{name:44s} rows_only spark_rows={len(srows)}")
            continue
        rel = con.sql(qdef.oracle)
        dcols = list(rel.columns)
        drows = [dict(zip(dcols, r)) for r in rel.fetchall()]
        cols = sorted(scols)
        ok = (
            cols == sorted(dcols)
            and len(srows) == len(drows)
            and normalize(srows, cols) == normalize(drows, cols)
        )
        n_fail += 0 if ok else 1
        print(
            f"{name:44s} {'ok' if ok else 'FAIL'} "
            f"spark={len(srows)} oracle={len(drows)} {round(time.time()-t0,2)}s",
            flush=True,
        )
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
