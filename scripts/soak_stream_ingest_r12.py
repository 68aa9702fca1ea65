"""Streaming-ingest soak (round 12): drive the multimodal ingest
pipeline through a REAL `readStream` over 30 one-file micro-batches
(300 fingerprints each, ~25% exact dups / ~15% near dups of earlier
epochs), maintenance policy ON, and record:

- per-micro-batch wall time from the streaming engine's own progress
  events (triggerExecution durationMs) — the wrapper's cost on top of
  the batch operator must stay flat;
- guard integrity: a full RESTART of the stream over the same input
  must replay nothing (no version movement, no match-log growth);
- dedup integrity at close: re-screening epoch 1's batch maps every
  member to its original accepted id.

Writes SCALE_PROBE_r12_streamsoak.json.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_EPOCHS = 30
BATCH = 300


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from tipoca_stream_spark.operators.index_maintenance import (
        IndexMaintenancePolicy,
    )
    from tipoca_stream_spark.session import get_spark
    from tipoca_stream_spark.streaming.multimodal_ingest import (
        MultimodalIngestConfig,
        MultimodalIngestPipeline,
    )

    spark = get_spark("stream-soak", shuffle_partitions=16)
    base = "/tmp/streamsoak_r12"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(os.path.join(base, "in"))

    rng = random.Random(1212)
    pool: list[str] = []
    nid = 0
    mtime = 1_700_200_000
    epoch_rows = []
    for e in range(N_EPOCHS):
        rows = []
        for _ in range(BATCH):
            r = rng.random()
            if pool and r < 0.25:
                fp = rng.choice(pool)
            elif pool and r < 0.40:
                src = rng.choice(pool)
                i = rng.randrange(64)
                fp = src[:i] + ("1" if src[i] == "0" else "0") + src[i + 1:]
            else:
                fp = "".join(rng.choice("01") for _ in range(64))
            pool.append(fp)
            rows.append((nid, fp))
            nid += 1
        epoch_rows.append(rows)
        p = os.path.join(base, "in", f"epoch{e:03d}.json")
        with open(p, "w") as f:
            for mid, fp in rows:
                f.write(json.dumps({"media_id": mid, "fp": fp}) + "\n")
        mtime += 60
        os.utime(p, (mtime, mtime))

    pol = IndexMaintenancePolicy(compact_files_per_bucket=6, vacuum_keep=2)
    cfg = MultimodalIngestConfig(
        root=os.path.join(base, "fpindex"),
        checkpoint_dir=os.path.join(base, "ckpt"),
        fingerprinter=lambda d: d.select(
            F.col("media_id"), F.col("fp").alias("phash")
        ),
        policy=pol,
    )
    pipe = MultimodalIngestPipeline(spark, cfg)
    schema = T.StructType(
        [T.StructField("media_id", T.LongType()), T.StructField("fp", T.StringType())]
    )

    def run():
        raw = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(os.path.join(base, "in"))
        )
        q = pipe.start(raw)
        q.awaitTermination(1800)
        return q

    t0 = time.time()
    q = run()
    wall_first = time.time() - t0
    progress = [
        {
            "batch": p["batchId"],
            "rows": p["numInputRows"],
            "trigger_ms": p["durationMs"].get("triggerExecution"),
        }
        for p in (json.loads(x.json) for x in q.recentProgress)
        if p["numInputRows"] > 0
    ]
    v_after = pipe.index.index.current_version()
    n_matches = pipe.matches().count()
    n_fps = pipe.index.fingerprints().count()

    # restart: must replay nothing
    t0 = time.time()
    run()
    wall_restart = time.time() - t0
    replayed = pipe.index.index.current_version() != v_after or (
        pipe.matches().count() != n_matches
    )

    # close: re-screen epoch 1 under fresh ids — all flagged to originals
    probe = spark.createDataFrame(
        [(10**9 + k, fp) for k, (_, fp) in enumerate(epoch_rows[0])],
        ["media_id", "fp"],
    ).select(
        F.col("media_id").cast("long").alias("media_id"),
        F.col("fp").alias("phash"),
    )
    rescreen = pipe.index.screen(probe)
    all_flagged = rescreen.select("member_id").distinct().count() == BATCH

    ms = [p["trigger_ms"] for p in progress if p["trigger_ms"]]
    record = {
        "metric": "streaming_multimodal_ingest_soak",
        "epochs": N_EPOCHS,
        "batch": BATCH,
        "per_batch_trigger_ms": ms,
        "first5_mean_ms": round(sum(ms[:5]) / 5, 0) if len(ms) >= 5 else None,
        "last5_mean_ms": round(sum(ms[-5:]) / 5, 0) if len(ms) >= 5 else None,
        "wall_first_run_s": round(wall_first, 1),
        "wall_restart_s": round(wall_restart, 1),
        "restart_replayed_anything": replayed,
        "index_fingerprints": n_fps,
        "total_matches": n_matches,
        "close_epoch1_all_flagged": all_flagged,
        "compactions": sum(1 for h in pol.history if h.get("compacted_buckets")),
        "lost_races": sum(len(h.get("lost_race", [])) for h in pol.history),
        "ingested_epochs": sorted(pipe._ingested_epochs()),
    }
    out = os.path.join(ROOT, "SCALE_PROBE_r12_streamsoak.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    summary = {k: v for k, v in record.items() if k != "per_batch_trigger_ms"}
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
