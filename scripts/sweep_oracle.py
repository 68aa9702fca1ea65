"""Full-registry DuckDB-oracle sweep, committed as an artifact (ADVICE
r10: the notes claimed 222/222 verified but no committed artifact covered
the queries outside the driver's 50-slot panel — this makes the claim
reproducible from the repo).

Runs EVERY entry of ``plans.QUERIES`` on Spark and its oracle on DuckDB
over the same parquet (default /root/testdata/sf0.01 — the driver's
correctness SF), compares row count + sorted column names +
order-insensitive rounded values (the driver-gate semantics mirrored by
tests/test_queries_oracle.py), and writes one JSON row per query.

Usage:
    python scripts/sweep_oracle.py [out.json] [sf_dir]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def normalize(rows, columns):
    out = []
    for row in rows:
        vals = []
        for c in columns:
            v = row[c]
            if isinstance(v, float):
                v = round(v, 6) if math.isfinite(v) else v
            if hasattr(v, "as_integer_ratio") and not isinstance(v, (int, float)):
                v = float(v)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "SWEEP_LOCAL.json"
    )
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    import duckdb

    from tipoca_stream_spark.plans import QUERIES
    from tipoca_stream_spark.session import get_spark

    spark = get_spark("oracle-sweep", shuffle_partitions=32)
    con = duckdb.connect()
    # off-SF oracle-plan hygiene (the standing gate since r11's 18.6 GB
    # group-rep CTE spill): DUCKDB_TEMP_CAP=20GB runs every oracle under a
    # hard temp ceiling, so a re-inlined plan fails loudly instead of
    # silently spilling the disk
    cap = os.environ.get("DUCKDB_TEMP_CAP")
    if cap:
        tmp = os.environ.get("DUCKDB_TEMP_DIR", "/tmp/duck_sweep_tmp")
        con.sql(f"SET temp_directory='{tmp}'")
        con.sql(f"SET max_temp_directory_size='{cap}'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")

    results: dict[str, dict] = {}
    t00 = time.time()
    for name, qdef in QUERIES.items():
        t0 = time.time()
        row: dict = {}
        try:
            sdf = qdef.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [r.asDict() for r in sdf.collect()]
            if qdef.oracle is None:
                row = {"mode": "rows_only", "spark_rows": len(srows),
                       "ok": True}
            else:
                rel = con.sql(qdef.oracle)
                dcols = list(rel.columns)
                drows = [dict(zip(dcols, r)) for r in rel.fetchall()]
                cols = sorted(scols)
                ok_cols = cols == sorted(dcols)
                ok_rows = len(srows) == len(drows)
                ok_vals = (
                    normalize(srows, cols) == normalize(drows, cols)
                    if ok_cols and ok_rows
                    else False
                )
                row = {
                    "mode": "oracle",
                    "spark_rows": len(srows),
                    "oracle_rows": len(drows),
                    "cols_match": ok_cols,
                    "rows_match": ok_rows,
                    "values_match": ok_vals,
                    "ok": ok_cols and ok_rows and ok_vals,
                }
        except Exception as e:
            row = {"mode": "error", "ok": False,
                   "err": f"{type(e).__name__}: {e}"[:300]}
        row["wall_s"] = round(time.time() - t0, 2)
        results[name] = row
        status = "ok" if row["ok"] else "FAIL"
        print(f"{name:44s} {status} {row['wall_s']}s", flush=True)

    n_ok = sum(1 for r in results.values() if r["ok"])
    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(results),
        "n_ok": n_ok,
        "n_fail": len(results) - n_ok,
        "wall_s": round(time.time() - t00, 1),
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"SWEEP {n_ok}/{len(results)} ok -> {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
