"""Debezium envelope decode (SURVEY.md §2.1 S1-S4).

The reference consumes Confluent-framed Avro: a 5-byte wire header (magic
byte 0x00 + big-endian schema id) followed by the Avro body
(pkg/serializer/serializer.go:50-83), with the schema fetched by id from a
registry (pkg/schemaregistry/schemaregistry.go:80-138). Here:

- ``wire_schema_id`` parses the header with built-in expressions (no UDF);
- body decode is pluggable by format:
  - ``json``: ``from_json`` against the envelope schema — Debezium's JSON
    converter wire format, fully supported in this container and what the
    tests use;
  - ``avro``: ``from_avro`` — requires the spark-avro data source jar,
    which is not bundled here; gated with a clear error (the container has
    no Avro libraries, so a pure-Python fallback would be hand-rolled
    binary parsing for no test benefit).
- ``SchemaRegistry`` is the driver-side id→schema cache analogue (retry +
  cache semantics of schemaregistry.go:115-138 collapse to a dict in a
  single-process driver; a real deployment plugs an HTTP client in).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC_BYTE = 0


def envelope_schema(row_schema: T.StructType) -> T.StructType:
    """Debezium envelope: before/after row images + source metadata + op.
    (pkg/transformer/debezium/message.go:58-86)."""
    return T.StructType(
        [
            T.StructField("before", row_schema, True),
            T.StructField("after", row_schema, True),
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
        ]
    )


def wire_schema_id(value: Column) -> Column:
    """Schema id from the Confluent wire header: bytes 1:5 big-endian
    (serializer.go:53). Pure expressions: substring bytes → unsigned ints."""
    b = lambda i: F.conv(F.hex(F.substring(value, i, 1)), 16, 10).cast("long")
    return (b(2) * 16777216 + b(3) * 65536 + b(4) * 256 + b(5)).alias("schema_id")


@dataclass
class SchemaRegistry:
    """Driver-side schema-id → envelope-schema cache
    (schemaregistry.go:80-138's cache, minus HTTP)."""

    schemas: dict[int, T.StructType] = field(default_factory=dict)

    def register(self, schema_id: int, row_schema: T.StructType) -> None:
        self.schemas[schema_id] = envelope_schema(row_schema)

    def get(self, schema_id: int) -> T.StructType:
        if schema_id not in self.schemas:
            raise KeyError(f"schema id {schema_id} not registered")
        return self.schemas[schema_id]


def decode_envelope(
    df: DataFrame,
    row_schema: T.StructType,
    value_col: str = "value",
    fmt: str = "json",
    framed: bool = False,
) -> DataFrame:
    """Decode the change-event payload into ``before``/``after``/``op``
    columns alongside the source columns (topic/partition/offset kept).

    ``framed=True`` strips the Confluent 5-byte header first and exposes
    ``schema_id`` (S3); tests drive both paths."""
    value = F.col(value_col)
    out_cols = [c for c in df.columns if c != value_col]
    if framed:
        df = df.withColumn("schema_id", wire_schema_id(value))
        out_cols.append("schema_id")
        payload = F.expr(f"substring({value_col}, 6, length({value_col}) - 5)")
    else:
        payload = value

    if fmt == "json":
        parsed = F.from_json(payload.cast("string"), envelope_schema(row_schema))
    elif fmt == "avro":
        try:
            from pyspark.sql.avro.functions import from_avro  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError("spark-avro not importable in this build") from e
        raise NotImplementedError(
            "avro body decode needs the spark-avro data source jar, which is "
            "not bundled in this container; use fmt='json' (Debezium JSON "
            "converter) or deploy with --packages org.apache.spark:spark-avro"
        )
    else:
        raise ValueError(f"unknown envelope format {fmt!r}")

    return df.select(
        *out_cols,
        parsed.getField("before").alias("before"),
        parsed.getField("after").alias("after"),
    )
