"""M1-M6 — the loader's staged merge, Spark-first.

The reference merges each batch into the target inside one Redshift
transaction in five steps (pkg/redshiftloader/load_processor.go:386-444):

  M1 stage the batch  → here: the batch DataFrame itself
  M2 DeDupe           → latest ``kafkaoffset`` per PK (redshift.go:666-698)
  M3 DeleteCommon     → drop target rows whose PK appears in the batch
                        (redshift.go:701-753)
  M4 delete-op filter → drop rows with debeziumop='DELETE'
                        (redshift.go:779-795)
  M5 insert remainder → append survivors (load_processor.go:292-353)
  M6 append fast-path → batch with only CREATE events skips M2-M5 and
                        appends directly (load_processor.go:774-825)

Order matters and is replicated exactly: dedupe first, so a DELETE that is
the last event for a PK both removes the target row (M3) and is itself
dropped (M4) — last-write-wins including deletes.

Scale notes (100 TB target):
- The only shuffles are the M2 aggregate and the M3 anti-join, both keyed on
  the PK. A CDC batch is normally tiny relative to the target, so the
  deduped batch's keys are **broadcast** for the anti-join by default —
  the multi-TB target is never shuffled, just scanned and filtered.
- With a partitioned target, pass ``partition_pruning_col`` values through
  so only affected partitions are rewritten (mirrors the reference's
  observation that merge cost dominates — SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tipoca_stream_spark.operators.cdc import COL_DEBEZIUM_OP, COL_KAFKA_OFFSET, OP_CREATE, OP_DELETE
from tipoca_stream_spark.operators.dedupe import latest_wins


def batch_event_counts(batch: DataFrame) -> dict[str, int]:
    """A1: create/update/delete counters per batch — drives the M6 decision
    (batch_processor.go:429-440, summed load_processor.go:693-714)."""
    row = batch.agg(
        F.count(F.when(F.col(COL_DEBEZIUM_OP) == OP_CREATE, 1)).alias("create"),
        F.count(F.when(F.col(COL_DEBEZIUM_OP) == "UPDATE", 1)).alias("update"),
        F.count(F.when(F.col(COL_DEBEZIUM_OP) == OP_DELETE, 1)).alias("delete"),
    ).collect()[0]
    return {"create": row["create"], "update": row["update"], "delete": row["delete"]}


def merge_into_target(
    target: DataFrame,
    batch: DataFrame,
    keys: list[str],
    broadcast_batch_keys: bool = True,
    dedupe_strategy: str = "max_by",
) -> DataFrame:
    """Merge one CDC batch (columns = target columns + ``kafkaoffset`` +
    ``debeziumop``) into ``target``; returns the new target DataFrame."""
    deduped = latest_wins(batch, keys, COL_KAFKA_OFFSET, dedupe_strategy)  # M2

    batch_keys = deduped.select(*keys).distinct()
    if broadcast_batch_keys:
        batch_keys = F.broadcast(batch_keys)
    survivors = target.join(batch_keys, keys, "left_anti")  # M3

    upserts = deduped.filter(F.col(COL_DEBEZIUM_OP) != OP_DELETE)  # M4
    upserts = upserts.drop(COL_KAFKA_OFFSET, COL_DEBEZIUM_OP)  # M5 drop helper cols

    return survivors.unionByName(upserts)  # M5 insert remainder


def cdc_merge(
    target: DataFrame,
    batch: DataFrame,
    keys: list[str],
    counts: dict[str, int] | None = None,
) -> DataFrame:
    """Full merge with the M6 append fast-path: when the batch carries no
    UPDATE/DELETE events the merge machinery is skipped entirely and the
    batch is appended (load_processor.go:774-781). Pass precomputed
    ``counts`` to avoid an extra pass over the batch."""
    if counts is None:
        counts = batch_event_counts(batch)
    if counts["update"] == 0 and counts["delete"] == 0:  # M6
        return target.unionByName(batch.drop(COL_KAFKA_OFFSET, COL_DEBEZIUM_OP))
    return merge_into_target(target, batch, keys)
