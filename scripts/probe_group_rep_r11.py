"""Degenerate-corpus probe for the group-representative near-dup shape
(round 11, VERDICT r10 Next #2): one fingerprint shared by 10^5 members
— the adversarial mega-dup group a real corpus can contain (one viral
image re-uploaded everywhere).

The claim under test: ``phash_group_reps`` emits exactly one row per
member (O(m)) with bounded wall time, where the pair shape
(``phash_near_dups``) would have to emit m(m-1)/2 = 5*10^9 rows — not a
bug in the pair operator (that IS the true pair set) but an output-shape
cost no algorithm can shrink, which is why the group-rep shape exists.
The probe also runs a mixed corpus (mega group + a near-miss neighbor
group + a linear tail of small groups) so the rep rule is exercised, and
a small control where BOTH shapes run so the pair blow-up ratio is
measured, not asserted.

Writes SCALE_PROBE_r11_grouprep.json. Usage:
    python scripts/probe_group_rep_r11.py
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

MEGA = 100_000


def main() -> None:
    from pyspark.sql import functions as F

    from tipoca_stream_spark.operators.phash import (
        phash_group_reps,
        phash_near_dups,
    )
    from tipoca_stream_spark.session import get_spark

    spark = get_spark("group-rep-probe", shuffle_partitions=32)
    out: dict = {"probe": "group_rep_degenerate", "mega_members": MEGA}

    # --- degenerate corpus: one fingerprint, 10^5 members, plus a
    # hamming-1 neighbor group with the global min id and a tail of
    # 1000 isolated one-member groups (distinct fps, far apart)
    fa = "0" * 64
    fb = "1" + "0" * 63
    mega = spark.range(100, 100 + MEGA).select(
        F.col("id").alias("media_id"), F.lit(fa).alias("phash")
    )
    nb = spark.range(1).select(
        F.lit(5).cast("long").alias("media_id"), F.lit(fb).alias("phash")
    )
    # tail fingerprints flip 16 spread bits per id -> pairwise far
    tail = spark.range(1_000_000, 1_001_000).select(
        F.col("id").alias("media_id"),
        F.concat(
            F.lpad(F.conv((F.col("id") * 2654435761).cast("string"), 10, 2), 32, "0"),
            F.reverse(
                F.lpad(F.conv((F.col("id") * 40503).cast("string"), 10, 2), 32, "0")
            ),
        ).substr(1, 64).alias("phash"),
    )
    ph = mega.unionByName(nb).unionByName(tail)

    t0 = time.time()
    reps = phash_group_reps(ph, max_hamming=8)
    n_rows = reps.count()
    mega_reps = (
        reps.filter(
            (F.col("member_id") >= 100) & (F.col("member_id") < 100 + MEGA)
        )
        .groupBy("rep_id", "hamming")
        .count()
        .collect()
    )
    wall = time.time() - t0
    out["group_rep"] = {
        "rows_out": n_rows,
        "rows_expected": MEGA + 1 + 1000,
        "pair_shape_rows_would_be": MEGA * (MEGA - 1) // 2,
        "wall_s": round(wall, 3),
        "mega_group_rep_rows": [
            {"rep_id": r["rep_id"], "hamming": r["hamming"], "n": r["count"]}
            for r in mega_reps
        ],
    }
    assert n_rows == MEGA + 1 + 1000, n_rows
    # every mega member adopts the hamming-1 neighbor's min id (5)
    assert len(mega_reps) == 1
    assert mega_reps[0]["rep_id"] == 5 and mega_reps[0]["hamming"] == 1

    # --- control at m=1000: run BOTH shapes, measure the ratio
    small = spark.range(100, 1100).select(
        F.col("id").alias("media_id"), F.lit(fa).alias("phash")
    ).unionByName(nb)
    t0 = time.time()
    pair_rows = phash_near_dups(small, max_hamming=8).count()
    pair_wall = time.time() - t0
    t0 = time.time()
    rep_rows = phash_group_reps(small, max_hamming=8).count()
    rep_wall = time.time() - t0
    out["control_m1000"] = {
        "pair_rows": pair_rows,
        "rep_rows": rep_rows,
        "pair_wall_s": round(pair_wall, 3),
        "rep_wall_s": round(rep_wall, 3),
        "output_ratio": round(pair_rows / rep_rows, 1),
    }

    # --- curvature: the full registered pipeline (fingerprint + group
    # rep) on growing synthetic documents corpora, same generator as the
    # r10 phash curvature probe — group-rep output is exactly n rows, so
    # unlike the pair shape there is no output-growth term at all
    from tipoca_stream_spark.operators.phash import phash_from_documents

    out["curvature"] = {}
    for n_docs in (5000, 10000, 20000, 50000):
        docs = spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("d"), F.expr("repeat('x', 20 + cast(id % 37 as int))")
            ).alias("text"),
        )

        def build():
            return phash_group_reps(phash_from_documents(docs), max_hamming=8)

        build().write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        rows = build().count()
        out["curvature"][str(n_docs)] = {"sec": round(best, 2), "rows": rows}
        assert rows == n_docs  # exactly one row per member
    secs = [out["curvature"][str(n)]["sec"] for n in (5000, 10000, 20000, 50000)]
    out["curvature_doubling_ratios"] = [
        round(b / a, 2) for a, b in zip(secs, secs[1:])
    ]

    path = os.path.join(ROOT, "SCALE_PROBE_r11_grouprep.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
