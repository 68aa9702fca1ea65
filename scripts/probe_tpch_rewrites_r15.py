"""Round-15 TPC-H rewrite candidates, measured interleaved against the
registered forms before any plans/tpch.py edit (guide §1: measure first).

- q17: brand-filter the per-part avg's input (the join keeps only brand
  partkeys anyway) and compute the avg as a window over the single
  brand-filtered scan — 2 lineitem scans + full-corpus agg → 1 scan.
- q20: promo-filter both aggregates' input, fuse the part_qty aggregate
  into a window over the (suppkey, partkey) aggregate — 2 scans → 1.
- q21: EXISTS/NOT-EXISTS self-joins → per-order window aggregates over
  one scan (3 lineitem scans / shuffles → 1).

Each candidate's rows are compared against the registered query's rows
(sorted, rounded) before timing. Prints one JSON line.

Usage: python scripts/probe_tpch_rewrites_r15.py [reps]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _dec(col, prec=14):
    return F.col(col).cast(f"decimal({prec},2)")


def _revenue_expr():
    return _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(14,2)")


def new_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tipoca_stream_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    li_b = li.join(
        F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey")
    )
    w = Window.partitionBy("l_partkey")
    avg_qty = F.sum(_dec("l_quantity")).over(w).cast("double") / F.count(F.lit(1)).over(w)
    return (
        li_b.withColumn("avg_qty", avg_qty)
        .filter(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg((F.sum(_dec("l_extendedprice")) / F.lit(7.0)).cast("double").alias("avg_yearly"))
    )


def new_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tipoca_stream_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = load_table(spark, sf_dir, "supplier")
    li_p = li.join(
        F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"), "left_semi"
    )
    sp = li_p.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(_dec("l_quantity")).alias("supp_qty")
    )
    w = Window.partitionBy("l_partkey")
    qualified = (
        sp.withColumn("part_qty", F.sum("supp_qty").over(w))
        .filter(F.col("supp_qty").cast("double") > F.lit(0.2) * F.col("part_qty").cast("double"))
        .select(F.col("l_suppkey").alias("s_suppkey"))
        .distinct()
    )
    return supp.join(qualified, ["s_suppkey"], "left_semi").select("s_suppkey", "s_name")


def new_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tipoca_stream_spark.sources.tables import load_table

    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    lif = li.join(orders_f, li.l_orderkey == F.col("o_orderkey")).drop("o_orderkey")
    w_o = Window.partitionBy("l_orderkey")
    w_os = Window.partitionBy("l_orderkey", "l_suppkey")
    df = (
        lif.withColumn("ms", F.max("l_shipdate").over(w_os))
        .withColumn("m1", F.max("l_shipdate").over(w_o))
        .withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w_o)))
        .withColumn(
            "n_top",
            F.size(
                F.collect_set(
                    F.when(F.col("l_shipdate") == F.col("m1"), F.col("l_suppkey"))
                ).over(w_o)
            ),
        )
        .withColumn(
            "m2s",
            F.max(F.when(F.col("ms") < F.col("m1"), F.col("ms"))).over(w_o),
        )
    )
    max_other = F.when(
        (F.col("ms") < F.col("m1")) | (F.col("n_top") >= 2), F.col("m1")
    ).otherwise(F.col("m2s"))
    waiting = df.filter(
        (F.col("n_supp") >= 2) & (F.col("l_shipdate") >= max_other)
    ).select("l_suppkey")
    return (
        waiting.join(F.broadcast(supp), waiting.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


CANDIDATES = {
    "tpch_q17_small_lot_revenue": new_q17,
    "tpch_q20_promo_suppliers": new_q20,
    "tpch_q21_waiting_suppliers": new_q21,
}


def rows_key(df):
    cols = sorted(df.columns)
    out = []
    for row in df.collect():
        vals = []
        for c in cols:
            v = row[c]
            if isinstance(v, float):
                v = round(v, 6) if math.isfinite(v) else v
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from tipoca_stream_spark.plans import QUERIES
    from tipoca_stream_spark.session import get_spark

    spark = get_spark("probe_tpch_rewrites_r15")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    out = {}
    for name, newfn in CANDIDATES.items():
        old = QUERIES[name].fn
        same = rows_key(old(spark, sf_dir)) == rows_key(newfn(spark, sf_dir))
        best_old, best_new = float("inf"), float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            old(spark, sf_dir).count()
            best_old = min(best_old, time.perf_counter() - t0)
            t0 = time.perf_counter()
            newfn(spark, sf_dir).count()
            best_new = min(best_new, time.perf_counter() - t0)
        out[name] = {
            "rows_match": same,
            "old": round(best_old, 3),
            "new": round(best_new, 3),
            "ratio": round(best_new / best_old, 3),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print("PROBE_TPCH_REWRITES " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
