"""Micro-bisect of the dedup_components graph-wave regression: in ONE
warmed JVM, interleave four variants of the query — (edges pre-distinct
on/off) x (sym pin: plain localCheckpoint / pin_partitioned) — min-of-N
each. Separates the two uncommitted-wave factors the fresh-JVM ABBA
cannot (it flips both at once)."""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from tipoca_stream_spark.operators import corpus_dedup as cd  # noqa: E402
from tipoca_stream_spark.operators import components as comp_mod  # noqa: E402
from tipoca_stream_spark.operators.checkpoint import SPILL_LEVEL, pin_partitioned  # noqa: E402
from tipoca_stream_spark.plans.training import JACCARD_THRESHOLD, _docs  # noqa: E402
from tipoca_stream_spark.session import get_spark  # noqa: E402


def run_query(spark, sf_dir, predistinct: bool) -> int:
    docs = _docs(spark, sf_dir)
    jacc = cd.ngram_jaccard_pairs(
        docs, "text", "doc_id", "source", JACCARD_THRESHOLD
    ).select("id_a", "id_b")
    keeper = F.min("doc_id").over(Window.partitionBy(F.md5("text")))
    exact = docs.select(keeper.alias("id_a"), F.col("doc_id").alias("id_b")).filter(
        F.col("id_a") != F.col("id_b")
    )
    edges = jacc.union(exact)
    if predistinct:
        edges = edges.distinct()
    comps = comp_mod.connected_components(edges, src="id_a", dst="id_b")
    return comps.select(F.col("node").alias("doc_id"), "component").count()


def plain_pin(df, *keys):  # stand-in for pin_partitioned: the r13close shape
    return df.localCheckpoint(eager=True, storageLevel=SPILL_LEVEL)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("REPS", "3"))
    spark = get_spark("probe_comps_bisect_r14")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    run_query(spark, sf_dir, True)  # warm

    variants = [
        ("predist+plainpin  (r13close shape)", True, plain_pin),
        ("predist+partpin", True, pin_partitioned),
        ("nodist+plainpin", False, plain_pin),
        ("nodist+partpin   (working tree)", False, pin_partitioned),
    ]
    times: dict[str, list[float]] = {name: [] for name, _, _ in variants}
    rows: dict[str, int] = {}
    for rep in range(reps):
        order = variants if rep % 2 == 0 else variants[::-1]
        for name, predist, pin in order:
            comp_mod.pin_partitioned = pin
            t0 = time.perf_counter()
            n = run_query(spark, sf_dir, predist)
            times[name].append(time.perf_counter() - t0)
            rows[name] = n
    comp_mod.pin_partitioned = pin_partitioned
    for name, _, _ in variants:
        ts = sorted(times[name])
        print(
            f"{name:38s} min={ts[0]:.3f} med={ts[len(ts)//2]:.3f} "
            f"all={[round(t,2) for t in times[name]]} rows={rows[name]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
