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

from pyspark.storagelevel import StorageLevel

# JVM-side serialized, memory-then-disk. (In PySpark's StorageLevel
# constants, MEMORY_AND_DISK is the serialized variant;
# MEMORY_AND_DISK_DESER — the localCheckpoint default — is not.)
SPILL_LEVEL = StorageLevel.MEMORY_AND_DISK
