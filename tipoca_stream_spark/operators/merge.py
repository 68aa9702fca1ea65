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

from tipoca_stream_spark.operators.cdc import COL_DEBEZIUM_OP, COL_KAFKA_OFFSET, OP_CREATE, OP_DELETE, OP_UPDATE
from tipoca_stream_spark.operators.dedupe import latest_wins


def batch_event_counts(batch: DataFrame) -> dict[str, int]:
    """A1: create/update/delete counters per batch — drives the M6 decision
    (batch_processor.go:429-440, summed load_processor.go:693-714)."""
    row = batch.agg(
        F.count(F.when(F.col(COL_DEBEZIUM_OP) == OP_CREATE, 1)).alias("create"),
        F.count(F.when(F.col(COL_DEBEZIUM_OP) == OP_UPDATE, 1)).alias("update"),
        F.count(F.when(F.col(COL_DEBEZIUM_OP) == OP_DELETE, 1)).alias("delete"),
    ).collect()[0]
    return {"create": row["create"], "update": row["update"], "delete": row["delete"]}


def merge_into_target(
    target: DataFrame,
    batch: DataFrame,
    keys: list[str],
    broadcast_batch_keys: bool = True,
    dedupe_strategy: str = "max_by",
    persist_registry: list[DataFrame] | None = None,
    persist_dedupe: bool = True,
) -> DataFrame:
    """Merge one CDC batch (columns = target columns + ``kafkaoffset`` +
    ``debeziumop``) into ``target``; returns the new target DataFrame.

    Callers that execute the result (e.g. the streaming pipeline) should
    pass ``persist_registry`` and unpersist its entries after the action —
    see ``CdcPipeline.merge_batch``. Callers whose ``target`` is statically
    empty (bootstrap into a fresh table) should pass
    ``persist_dedupe=False``: the optimizer prunes the anti-join branch, so
    the dedupe has exactly one consumer and the materialization point only
    costs a cache write + an extra job."""
    # M2 — persisted by default: both the anti-join key side and the upsert
    # side read it, and without a materialization point each branch would
    # re-execute the dedupe aggregation. A CDC batch is small by
    # construction.
    deduped = latest_wins(batch, keys, COL_KAFKA_OFFSET, dedupe_strategy)
    if persist_dedupe:
        deduped = deduped.persist()
        if persist_registry is not None:
            persist_registry.append(deduped)

    batch_keys = deduped.select(*keys)  # already unique per key post-dedupe
    if broadcast_batch_keys:
        batch_keys = F.broadcast(batch_keys)
    survivors = target.join(batch_keys, keys, "left_anti")  # M3

    upserts = deduped.filter(F.col(COL_DEBEZIUM_OP) != OP_DELETE)  # M4
    upserts = upserts.drop(COL_KAFKA_OFFSET, COL_DEBEZIUM_OP)  # M5 drop helper cols

    return survivors.unionByName(upserts)  # M5 insert remainder


def merge_with_offsets(
    target: DataFrame,
    batch: DataFrame,
    keys: list[str],
    broadcast_batch_keys: bool = True,
    persist_registry: list[DataFrame] | None = None,
) -> DataFrame:
    """Offset-aware merge: ``target`` retains ``kafkaoffset`` per row, and a
    contested key is resolved by comparing the stored offset against the
    batch's — so the result converges even when epochs are replayed or
    delivered out of order (the blind merge assumes source order, which
    Kafka guarantees per partition but file sources only per mtime; see the
    reference's T2 discussion, SURVEY.md §2.10).

    Plan shape: unchanged rows = broadcast anti-join (the big target is
    scanned once, never shuffled); contested rows = broadcast semi-join +
    union with the batch + latest-wins — all bounded by batch size."""
    deduped = latest_wins(batch, keys, COL_KAFKA_OFFSET, "max_by").persist()
    if persist_registry is not None:
        persist_registry.append(deduped)
    batch_keys = deduped.select(*keys)
    if broadcast_batch_keys:
        batch_keys = F.broadcast(batch_keys)

    untouched = target.join(batch_keys, keys, "left_anti")
    contested_target = target.join(batch_keys, keys, "left_semi").withColumn(
        COL_DEBEZIUM_OP, F.lit(OP_UPDATE)  # live rows behave as prior upserts
    )
    contested = contested_target.unionByName(deduped)
    winners = latest_wins(contested, keys, COL_KAFKA_OFFSET, "max_by")
    winners = winners.filter(F.col(COL_DEBEZIUM_OP) != OP_DELETE).drop(COL_DEBEZIUM_OP)
    return untouched.unionByName(winners)


def cdc_merge(
    target: DataFrame,
    batch: DataFrame,
    keys: list[str],
    counts: dict[str, int] | None = None,
    persist_registry: list[DataFrame] | None = None,
) -> DataFrame:
    """Full merge with the M6 append fast-path: when the batch carries no
    UPDATE/DELETE events the merge machinery is skipped entirely and the
    batch is appended (load_processor.go:774-781). Pass precomputed
    ``counts`` to avoid an extra pass over the batch."""
    if counts is None:
        counts = batch_event_counts(batch)
    if counts["update"] == 0 and counts["delete"] == 0:  # M6
        return target.unionByName(batch.drop(COL_KAFKA_OFFSET, COL_DEBEZIUM_OP))
    return merge_into_target(target, batch, keys, persist_registry=persist_registry)
