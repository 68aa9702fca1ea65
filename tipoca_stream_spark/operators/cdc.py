"""CDC row-image operators (SURVEY.md §2.2 P1-P3, §2.1 S10).

A Debezium change event carries ``before`` and ``after`` row images; their
presence encodes the operation (pkg/transformer/debezium/message.go:90-114,
constants pkg/serializer/serializer.go:10-14):

- after only            → CREATE
- before and after      → UPDATE
- before only           → DELETE

The engine annotates every row with ``kafkaoffset`` and ``debeziumop``
(message.go:327-331, column names pkg/transformer/transformer.go:10-17) —
those two columns drive the loader's dedupe and merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# pkg/serializer/serializer.go:10-14
OP_CREATE = "CREATE"
OP_UPDATE = "UPDATE"
OP_DELETE = "DELETE"

# pkg/transformer/transformer.go:10-17
COL_KAFKA_OFFSET = "kafkaoffset"
COL_DEBEZIUM_OP = "debeziumop"


def skip_tombstones(df: DataFrame, value_col: str = "value") -> DataFrame:
    """S10: drop zero-length Kafka messages
    (pkg/redshiftbatcher/batcher_handler.go:230-237)."""
    v = F.col(value_col)
    return df.filter(v.isNotNull() & (F.length(v) > 0))


def classify_operation(before: Column, after: Column) -> Column:
    """P2: operation from before/after presence (message.go:90-114)."""
    return (
        F.when(after.isNull() & before.isNotNull(), F.lit(OP_DELETE))
        .when(before.isNull() & after.isNotNull(), F.lit(OP_CREATE))
        .otherwise(F.lit(OP_UPDATE))
    )


def extract_row_image(
    df: DataFrame,
    before_col: str = "before",
    after_col: str = "after",
    offset_col: str = "offset",
) -> DataFrame:
    """P1+P2+P3: pick the changed-row image (the reference uses ``before``
    for DELETE and ``after`` otherwise — message.go:269-295), flatten it to
    top-level columns, and annotate ``kafkaoffset``/``debeziumop``.

    One narrow projection — no shuffle; at 100 TB this is pure map work.
    """
    before, after = F.col(before_col), F.col(after_col)
    op = classify_operation(before, after)
    image = F.when(op == OP_DELETE, before).otherwise(after)
    field_names = [f.name for f in df.schema[after_col].dataType.fields]
    return df.select(
        *[image.getField(n).alias(n.lower()) for n in field_names],
        F.col(offset_col).cast("long").alias(COL_KAFKA_OFFSET),
        op.alias(COL_DEBEZIUM_OP),
    )
