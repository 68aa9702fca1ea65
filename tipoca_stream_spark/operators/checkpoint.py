"""Shared lineage-truncation storage level.

Every iterative operator here pins intermediates with ``localCheckpoint``
(lineage truncation — components.py explains why). PySpark's DEFAULT
checkpoint storage is MEMORY_AND_DISK_DESER: deserialized on-heap rows,
the most heap-hungry representation Spark has. That default is what the
round-9 sf4 curvature probe hit: the triangle plan's pinned oriented
edge table plus a second rep's copy exhausted a 16 GiB single-JVM heap
(GCLocker allocation stalls → OOM) even though each individual run fits.

``SPILL_LEVEL`` = MEMORY_AND_DISK (SERIALIZED on the JVM side): compact
byte blocks that evict to disk under pressure instead of holding
deserialized row objects on-heap. The deserialization cost on re-read is
paid only by the (few, bounded) branches that re-scan a pin; in exchange
a pinned working set larger than executor memory degrades to disk reads
instead of killing the executor — the behavior you want at 100 TB, where
"the edge table got bigger than the cluster's cache" must mean slower,
never dead. Answers are unaffected (serialization is exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

# JVM-side serialized, memory-then-disk. (In PySpark's StorageLevel
# constants, MEMORY_AND_DISK is the serialized variant;
# MEMORY_AND_DISK_DESER — the localCheckpoint default — is not.)
SPILL_LEVEL = StorageLevel.MEMORY_AND_DISK


def pin_partitioned(df: DataFrame, *keys: str) -> DataFrame:
    """Repartition on ``keys`` and localCheckpoint so the pinned table
    ADVERTISES hashpartitioning(keys) to every later plan that scans it.

    ``Dataset.checkpoint`` copies ``physicalPlan.outputPartitioning`` into
    the LogicalRDD it returns — but under AQE the physical plan is an
    ``AdaptiveSparkPlanExec``, which reports Unknown partitioning, so a
    plain ``repartition(k).localCheckpoint()`` yields a pin that every
    downstream join re-shuffles (measured: the per-round edge exchange the
    iterative operators try to avoid came back). Building the pin with AQE
    briefly disabled makes the checkpoint capture the real
    hashpartitioning; the conf flip covers only the pin's own build job
    and is restored immediately. Partition count = the session's
    ``spark.sql.shuffle.partitions`` — the deliberate scale knob (local:
    core count; cluster: sized to the cluster), not a local constant.

    Caveats, both measured (OPTIMIZATION_r14.md):

    - AQE-off planning extends to everything upstream of the pin in the
      same job (no runtime broadcast conversion / skew split / coalescing
      there). The graph operators that use this pin over the explode-
      shaped cooccurrence upstream measured FASTER (0.73-0.89x); the
      LSH-pair upstream of connected_components measured SLOWER, so that
      operator deliberately keeps a plain checkpoint.
    - A tiny pin inflated to the static partition count makes every
      later scan pay that many tasks; callers whose pinned table is small
      relative to the session parallelism should also not use this.

    Partitioning metadata never changes results.
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return df.repartition(*[str(k) for k in keys]).localCheckpoint(
            eager=True, storageLevel=SPILL_LEVEL
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
