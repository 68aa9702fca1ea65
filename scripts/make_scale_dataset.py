"""Deterministic scale-up of the driver's testdata by key-offset replication.

Builds an sf{0.1*MULT} dataset under the repo (default ``.scale/sf1``) from
the read-only ``/root/testdata/sf0.1`` so the bench can measure the
sf1/sf0.1 scaling CURVE, not just audit plan shapes (VERDICT r4, next-round
item 1). Design:

- fact tables (customer supplier part orders lineitem events documents
  embeddings) are replicated MULT times; every BIGINT key column gets
  ``replica * 10_000_000_000`` added, the SAME offset on both sides of
  every FK edge (o_custkey↔c_custkey, l_partkey↔p_partkey, ...), so joins
  scale linearly and referential integrity holds exactly;
- dimension tables (region, nation) stay fixed — TPC-H's own scaling rule —
  so per-group aggregate fan-in grows 10x, as it would on a real corpus;
- ``documents.text`` gets a replica digit appended to EVERY token: within-
  replica near-dup structure is preserved exactly (the same transform hits
  every doc) while cross-replica shingle overlap drops to ~zero — without
  this, every doc would have MULT exact copies and pair-output would grow
  quadratically, measuring output explosion instead of the scaling curve;
- ``embeddings.embedding`` is rotated by the replica index — same norm and
  within-replica geometry, near-zero cross-replica cosine, same reasoning.

Everything is a pure column transform of the source rows — no RNG — so the
dataset is bit-reproducible.

Usage: python scripts/make_scale_dataset.py [--mult 10] [--src /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

KEY_OFFSET = 10_000_000_000

# table -> columns that carry the replica offset
OFFSET_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]


def replicate(spark, src: str, dst: str, mult: int) -> None:
    os.makedirs(dst, exist_ok=True)
    reps = spark.range(mult).withColumnRenamed("id", "_r")
    for name in DIMS:
        df = spark.read.parquet(f"{src}/{name}.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
    for name, key_cols in OFFSET_COLS.items():
        df = spark.read.parquet(f"{src}/{name}.parquet")
        out = df.crossJoin(F.broadcast(reps))
        for c in key_cols:
            out = out.withColumn(c, F.col(c) + F.col("_r") * F.lit(KEY_OFFSET))
        if name == "documents":
            # replica-salt every token (see module docstring)
            out = out.withColumn(
                "text",
                F.expr(r"regexp_replace(text, '(\\S+)', concat('$1', _r))"),
            ).withColumn("n_chars", F.length("text"))
        if name == "embeddings":
            # rotate by replica index: element i of the output is element
            # (i + _r) mod dim of the input
            out = out.withColumn(
                "embedding",
                F.expr(
                    "transform(embedding, (x, i) -> "
                    "embedding[int((i + _r) % size(embedding))])"
                ),
            )
        out = out.drop("_r")
        # a handful of files per table: parallel scans without a small-file
        # swarm (the source is one file per table)
        n_files = max(1, out.rdd.getNumPartitions() // 4)
        out.repartition(min(n_files, 16)).write.mode("overwrite").parquet(
            f"{dst}/{name}.parquet"
        )
        print(f"{name}: {spark.read.parquet(f'{dst}/{name}.parquet').count()} rows")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=None)
    args = ap.parse_args()
    sf = 0.1 * args.mult
    dst = args.dst or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale",
        f"sf{sf:g}",
    )
    from tipoca_stream_spark.session import get_spark

    spark = get_spark("make_scale_dataset")
    replicate(spark, args.src, dst, args.mult)
    print("wrote", dst)
    spark.stop()


if __name__ == "__main__":
    main()
