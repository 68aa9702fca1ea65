"""Batch file sinks: gzip ND-JSON batches + COPY manifest (S5/S6) and the
batcher→loader Job control record (F8).

Reference behaviors preserved:
- one gzip ND-JSON file per (batch, partition), named
  ``{endOffset}_offset_{partition}_partition.json.gz``
  (batch_processor.go:202-232);
- gzip BestSpeed (util/compress.go:9-23) → compression level 1;
- null values omitted from each JSON row (batch_processor.go:300-314) —
  Spark's JSON writer drops nulls by default (ignoreNullFields);
- manifest: ``{"entries": [{"url": ..., "mandatory": true}]}``
  (s3sink/s3sink.go:23-30,92-104).
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_batch_json_gz(
    batch: DataFrame,
    out_dir: str,
    partition_col: str = "partition",
    offset_col: str = "kafkaoffset",
) -> list[str]:
    """S5: write one gzip ND-JSON file per source partition, named by the
    partition's end offset. Repartitioning by the source partition keeps
    one output file per Kafka partition, as the reference's per-partition
    batches do."""
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, "_spark_out")
    n_parts = [r[0] for r in batch.select(partition_col).distinct().collect()]
    (
        batch.repartition(max(len(n_parts), 1), F.col(partition_col))
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .option("compression", "gzip")
        .option("ignoreNullFields", "true")
        .json(tmp)
    )
    # rename to the reference's {endOffset}_offset_{partition}_partition.json.gz
    end_offsets = {
        r[partition_col]: r["end_offset"]
        for r in batch.groupBy(partition_col).agg(F.max(offset_col).alias("end_offset")).collect()
    }
    paths = []
    for part, end in sorted(end_offsets.items()):
        files = glob.glob(os.path.join(tmp, f"{partition_col}={part}", "part-*.json.gz"))
        merged = os.path.join(out_dir, f"{end}_offset_{part}_partition.json.gz")
        # concatenated gzip members form a valid gzip stream
        with open(merged, "wb") as out:
            for f in sorted(files):
                with open(f, "rb") as src:
                    out.write(src.read())
        paths.append(merged)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return paths


def write_manifest(paths: list[str], manifest_path: str) -> str:
    """S6: Redshift COPY manifest (s3sink.go:23-30)."""
    body = {"entries": [{"url": p, "mandatory": True} for p in paths]}
    with open(manifest_path, "w") as f:
        json.dump(body, f)
    return manifest_path


@dataclass
class Job:
    """Batcher→loader control record (pkg/redshiftloader/job.go:10-46).
    In a single Spark app this is an in-process hand-off; kept as a real
    record for two-stage deployments (F8)."""

    upstream_topic: str
    start_offset: int
    end_offset: int
    csv_dialect: str = "json"
    s3_path: str = ""
    schema_id: int = 0
    schema_id_key: int = -1
    mask_schema: str = ""
    extra_mask_schema: str = ""
    skip_merge: bool = False
    batch_bytes: int = 0
    create_events: int = 0
    update_events: int = 0
    delete_events: int = 0

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "Job":
        return cls(**json.loads(s))

    @property
    def allow_merge(self) -> bool:
        """M6 decision (load_processor.go:774-781)."""
        return self.update_events > 0 or self.delete_events > 0
