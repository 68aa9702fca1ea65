"""D3-D6 — schema diff → migration plan.

The reference compares the incoming table schema against the live target and
classifies every difference into three strategies
(pkg/redshift/redshift.go:988-1190 — CheckSchemas :992, checkColumn
:998-1069, checkColumnsAndOrdering :1076-1190):

- D4 strategy 1: in-place varchar resize (redshift.go:451-469)
- D5 strategy 2: transactable ALTERs — add/drop column, sortkey alter
  (redshift.go:471-504)
- D6 strategy 3: full table rebuild for type changes / PK changes / distkey
  changes (ReplaceTable redshift.go:521-594, triggered from
  load_processor.go:544-589)

For a Spark-native (parquet/Delta-style) target: ADD_COLUMN maps to
mergeSchema-on-append; VARCHAR_RESIZE is a no-op (StringType is unsized);
everything in strategy 3 is a rewrite (``CREATE TABLE AS SELECT`` with the
new schema). The planner still reports all three classes so a JDBC sink can
emit real ALTER statements.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

from tipoca_stream_spark.schema.model import Table


class MigrationKind(Enum):
    ADD_COLUMN = "add_column"  # D5
    DROP_COLUMN = "drop_column"  # D5
    ALTER_SORTKEY = "alter_sortkey"  # D5
    VARCHAR_RESIZE = "varchar_resize"  # D4
    TYPE_CHANGE = "type_change"  # D6 (rebuild)
    PRIMARY_KEY_CHANGE = "primary_key_change"  # D6
    DISTKEY_CHANGE = "distkey_change"  # D6


# strategy buckets, mirroring the classification in redshift.go:1076-1190
TRANSACTABLE = {MigrationKind.ADD_COLUMN, MigrationKind.DROP_COLUMN, MigrationKind.ALTER_SORTKEY}
IN_PLACE = {MigrationKind.VARCHAR_RESIZE}
REBUILD = {MigrationKind.TYPE_CHANGE, MigrationKind.PRIMARY_KEY_CHANGE, MigrationKind.DISTKEY_CHANGE}


@dataclass
class MigrationOp:
    kind: MigrationKind
    column: str | None = None
    detail: str = ""

    @property
    def requires_rebuild(self) -> bool:
        return self.kind in REBUILD


def diff_schemas(incoming: Table, target: Table) -> list[MigrationOp]:
    """CheckSchemas (redshift.go:992): produce the ordered migration plan to
    evolve ``target`` into ``incoming``."""
    ops: list[MigrationOp] = []
    tgt = {c.name: c for c in target.columns}
    inc = {c.name: c for c in incoming.columns}

    for name, col in inc.items():
        if name not in tgt:
            ops.append(MigrationOp(MigrationKind.ADD_COLUMN, name, f"type={col.spark_type.simpleString()}"))
            continue
        old = tgt[name]
        if old.spark_type != col.spark_type:
            # string→string length changes would be VARCHAR_RESIZE; Spark
            # strings are unsized so only real type changes remain (D6).
            ops.append(
                MigrationOp(
                    MigrationKind.TYPE_CHANGE,
                    name,
                    f"{old.spark_type.simpleString()}→{col.spark_type.simpleString()}",
                )
            )
    for name in tgt:
        if name not in inc:
            ops.append(MigrationOp(MigrationKind.DROP_COLUMN, name))

    if set(incoming.primary_keys) != set(target.primary_keys):
        ops.append(
            MigrationOp(
                MigrationKind.PRIMARY_KEY_CHANGE,
                None,
                f"{target.primary_keys}→{incoming.primary_keys}",
            )
        )
    if incoming.dist_key != target.dist_key:
        ops.append(MigrationOp(MigrationKind.DISTKEY_CHANGE, None, f"{target.dist_key}→{incoming.dist_key}"))
    if incoming.sort_keys != target.sort_keys:
        ops.append(MigrationOp(MigrationKind.ALTER_SORTKEY, None, f"{target.sort_keys}→{incoming.sort_keys}"))
    return ops


def plan_requires_rebuild(ops: list[MigrationOp]) -> bool:
    """Strategy selection (redshift.go:1076-1190): any rebuild-class op
    forces the D6 ReplaceTable path."""
    return any(op.requires_rebuild for op in ops)
