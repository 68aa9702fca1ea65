"""Round-15 streaming-trigger probe: replicate bench.py's stream_row
steady-state shape and count the Spark JOBS per steady micro-batch (the
driver round trips VERDICT r14 next #3 targets), by scraping DAGScheduler
INFO lines. Job counts are host-load-insensitive — the diagnostic works
while other suites run. Prints one JSON line.

Usage: python scripts/probe_streaming_r15.py [n_rows n_steady]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    n_steady = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from tipoca_stream_spark.session import get_spark
    from tipoca_stream_spark.sources.tables import load_table
    from tipoca_stream_spark.streaming.pipeline import CdcPipeline, CdcPipelineConfig

    spark = get_spark("probe_streaming_r15")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    sc = spark.sparkContext
    stream_root = tempfile.mkdtemp(prefix="probe_streaming_r15_")
    try:
        row_schema = T.StructType(
            [
                T.StructField("user_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("value", T.DoubleType()),
            ]
        )
        raw_schema = "topic string, partition int, offset long, value string"
        in_dir = os.path.join(stream_root, "in")
        ev = (
            load_table(spark, sf_dir, "events")
            .select("user_id", "event_type", "value")
            .limit(n_rows)
        )
        env = ev.select(
            F.lit("db.server.probe").alias("topic"),
            F.lit(0).alias("partition"),
            F.monotonically_increasing_id().alias("offset"),
            F.to_json(
                F.struct(
                    F.lit(None).cast(row_schema).alias("before"),
                    F.struct("user_id", "event_type", "value").alias("after"),
                    F.lit("c").alias("op"),
                    F.monotonically_increasing_id().alias("ts_ms"),
                )
            ).alias("value"),
        )
        env.repartition(n_steady + 1).write.mode("overwrite").json(in_dir)
        cfg = CdcPipelineConfig(
            table="probe_streaming",
            primary_keys=["user_id"],
            row_schema=row_schema,
            target_root=os.path.join(stream_root, "targets"),
            checkpoint_dir=os.path.join(stream_root, "ckpt"),
            catalog_buckets=32,
        )
        p = CdcPipeline(spark, cfg)

        def run_stream():
            raw = (
                spark.readStream.schema(raw_schema)
                .option("maxFilesPerTrigger", 1)
                .json(in_dir)
            )
            q = p.start(raw, trigger_available_now=True)
            q.awaitTermination()

        first = sorted(glob.glob(os.path.join(in_dir, "part-*.json")))
        held_dir = os.path.join(stream_root, "held")
        os.makedirs(held_dir, exist_ok=True)
        for f in first[1:]:
            os.rename(f, os.path.join(held_dir, os.path.basename(f)))
        run_stream()  # bootstrap, untimed
        for f in os.listdir(held_dir):
            os.rename(os.path.join(held_dir, f), os.path.join(in_dir, f))

        # INFO-level DAGScheduler lines on stderr give "Job N finished:
        # <callsite>, took Ns" — redirect stderr when running this probe
        # and count/attribute jobs per steady trigger from the log
        sc.setLogLevel("INFO")
        t0 = time.perf_counter()
        run_stream()
        dt = time.perf_counter() - t0
        sc.setLogLevel("WARN")
        print(
            json.dumps(
                {
                    "probe": "streaming_r15",
                    "n_rows": n_rows,
                    "n_steady": n_steady,
                    "steady_wall_s": round(dt, 3),
                    "latency_per_trigger_s": round(dt / n_steady, 3),
                    "note": "job count from stderr DAGScheduler lines (see log)",
                }
            )
        )
    finally:
        shutil.rmtree(stream_root, ignore_errors=True)


if __name__ == "__main__":
    main()
