"""Pre-verify the driver correctness panel (the first 50 entries of
``plans.QUERIES``) against the DuckDB oracles with the DRIVER'S EXACT
canonicalization — pandas ``sort_values`` on the raw frames (NOT the
sweep's str-keyed sort), float columns rounded to 6, timestamps
normalized to microseconds. Run this after every ``_PANEL`` rotation
(rounds 11 and 12 both pre-verified their rotations this way) so an
unsortable output shape or value drift is caught BEFORE the driver
grades it (the r11 embed_quantize_int8 ERR class).

Usage: python scripts/verify_panel.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    import duckdb
    import pandas as pd

    from tipoca_stream_spark.plans import QUERIES, _PANEL
    from tipoca_stream_spark.session import get_spark

    # --unverified (round 13): verify the queries NOT in the current
    # panel instead — the wave-(N+1) pre-validation (pass CORRECTNESS
    # files on the driver side; here "unverified" = registry minus panel)
    names = list(_PANEL)
    argv = [a for a in sys.argv[1:] if a != "--unverified"]
    if "--unverified" in sys.argv[1:]:
        names = [n for n in QUERIES if n not in set(_PANEL)]
    sf = argv[0] if argv else "/root/testdata/sf0.01"
    spark = get_spark("panel-verify", shuffle_partitions=32)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf}/{t}.parquet"
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")

    def canon(df, cols):
        df = df[cols].copy()
        for c in cols:
            col = df[c]
            if pd.api.types.is_float_dtype(col):
                df[c] = col.round(6)
            elif pd.api.types.is_datetime64_any_dtype(col):
                df[c] = col.astype("datetime64[us]")
        return df.sort_values(cols).reset_index(drop=True).astype(str)

    bad = []
    for i, name in enumerate(names):
        q = QUERIES[name]
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf).toPandas()
            ddf = con.sql(q.oracle).df()
            cols = sorted(sdf.columns)
            assert sorted(ddf.columns) == cols, \
                f"schema {sorted(ddf.columns)} vs {cols}"
            assert len(sdf) == len(ddf), f"rows {len(sdf)} vs {len(ddf)}"
            assert canon(sdf, cols).equals(canon(ddf, cols)), "value mismatch"
            status = "ok"
        except Exception as e:
            status = f"FAIL: {type(e).__name__}: {e}"
            bad.append((name, status))
        print(f"{i + 1:2d}/{len(names)} {name}: {status} "
              f"({time.time() - t0:.1f}s)", flush=True)
    print("FAILURES:", bad if bad else "none")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
