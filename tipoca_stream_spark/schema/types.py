"""Type mapping: Debezium/Avro and MySQL source types → Spark types.

The reference maps both layers to Redshift types (pkg/redshift/redshift.go):

- Avro/Debezium → Redshift: redshift.go:1202-1213
- MySQL source  → Redshift (takes precedence, fallback to Avro map at
  redshift.go:1376-1393): redshift.go:1215-1262
- length/precision shaping: applyLength redshift.go:1322-1366 (varchar
  length = source × 4 UTF-8 ratio, clamp to [50 if masked, 65535] —
  applyRange redshift.go:1264-1272, defaults redshift.go:26-39); numeric
  precision ≤ 38, scale ≤ 37 (computeScale redshift.go:1274-1294); masked
  columns coerce to varchar(50) (redshift.go:31,1347-1354).

Spark has no varchar length in-engine, so string sizing matters only for a
JDBC/warehouse DDL generator — ``varchar_length`` reproduces the arithmetic
for that sink path. In-engine, everything string-ish is StringType.

No arrays/maps/structs/intervals in the reference model (SURVEY.md §1.2):
flat relational columns only.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

# redshift.go:1202-1213 (Avro/Debezium type → engine type)
DEBEZIUM_TO_SPARK: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "float": T.FloatType(),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "int": T.IntegerType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "long": T.LongType(),
    "bigint": T.LongType(),
    "string": T.StringType(),
}

# redshift.go:1215-1262 (MySQL source type → engine type); entries mapping to
# decimal are resolved with precision/scale in resolve_spark_type.
MYSQL_TO_SPARK: dict[str, T.DataType | str] = {
    "bigint": T.LongType(),
    "bigint unsigned": "decimal",  # redshift.go: numeric(20,0)
    "binary": T.StringType(),
    "bit": T.BooleanType(),
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    "blob": T.StringType(),
    "char": T.StringType(),
    "date": T.DateType(),
    "datetime": T.TimestampNTZType(),
    "dec": "decimal",
    "decimal": "decimal",
    "double": T.DoubleType(),
    "double precision": T.DoubleType(),
    "enum": T.StringType(),
    "fixed": "decimal",
    "float": T.FloatType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "integer unsigned": T.LongType(),
    "int unsigned": T.LongType(),
    "json": T.StringType(),
    "longblob": T.StringType(),
    "longtext": T.StringType(),
    "mediumblob": T.StringType(),
    "mediumint": T.IntegerType(),
    "mediumint unsigned": T.LongType(),
    "mediumtext": T.StringType(),
    "numeric": "decimal",
    "polygon": T.StringType(),  # value blanked — debezium/message.go:298-302
    "set": T.StringType(),
    "smallint": T.ShortType(),
    "smallint unsigned": T.IntegerType(),
    "text": T.StringType(),
    "time": T.StringType(),  # varchar(32) in the reference
    "timestamp": T.TimestampNTZType(),
    "tinyblob": T.StringType(),
    "tinyint": T.ShortType(),
    "tinyint unsigned": T.ShortType(),
    "tinytext": T.StringType(),
    "varbinary": T.StringType(),
    "varchar": T.StringType(),
    "year": T.DateType(),
}

# redshift.go:26-39,48
VARCHAR_RATIO = 4.0
MAX_VARCHAR = 65535
DEFAULT_VARCHAR = 256
MASKED_VARCHAR = 50

MAX_DECIMAL_PRECISION = 38  # redshift.go:1274-1294
MAX_DECIMAL_SCALE = 37

_TYPE_PARENS = re.compile(r"^([a-z ]+?)\s*\((\d+)(?:\s*,\s*(\d+))?\)\s*(unsigned)?$")


def _parse_source_type(column_type: str) -> tuple[str, int | None, int | None]:
    """``decimal(10,4)`` → (``decimal``, 10, 4); ``int(11) unsigned`` →
    (``int unsigned``, 11, None)."""
    s = column_type.strip().lower()
    m = _TYPE_PARENS.match(s)
    if not m:
        return s, None, None
    base, p, sc, unsigned = m.groups()
    if unsigned:
        base = f"{base.strip()} unsigned"
    return base.strip(), int(p), int(sc) if sc is not None else None


def compute_decimal(precision: int | None, scale: int | None) -> T.DecimalType:
    """computeScale redshift.go:1274-1294: precision ≤ 38, scale ≤ 37,
    scale < precision."""
    p = min(precision if precision is not None else 10, MAX_DECIMAL_PRECISION)
    s = min(scale if scale is not None else 0, MAX_DECIMAL_SCALE, max(p - 1, 0))
    return T.DecimalType(p, s)


def varchar_length(source_length: int | None, masked: bool = False) -> int:
    """applyLength/applyRange redshift.go:1264-1366: ×4 UTF-8 ratio, clamped
    to [MASKED_VARCHAR if masked else 1, 65535]; masked columns pin to 50."""
    if masked:
        return MASKED_VARCHAR
    if source_length is None:
        return DEFAULT_VARCHAR
    import math

    n = int(math.ceil(source_length * VARCHAR_RATIO))
    return max(1, min(n, MAX_VARCHAR))


def debezium_to_spark_type(debezium_type: str) -> T.DataType:
    return DEBEZIUM_TO_SPARK.get(debezium_type.lower(), T.StringType())


def mysql_to_spark_type(column_type: str) -> T.DataType:
    base, p, s = _parse_source_type(column_type)
    mapped = MYSQL_TO_SPARK.get(base)
    if mapped is None:
        return T.StringType()
    if mapped == "decimal":
        if base == "bigint unsigned" and p is None:
            p = 20  # numeric(20,0) — redshift.go:1215-1262
        return compute_decimal(p, s)
    return mapped


def resolve_spark_type(
    debezium_type: str,
    source_column_type: str | None = None,
    masked: bool = False,
) -> T.DataType:
    """Source type takes precedence over the Avro type (redshift.go:1376-1393);
    masked columns become StringType (the hash digest) regardless —
    redshift.go:1347-1354."""
    if masked:
        return T.StringType()
    if source_column_type:
        base, _, _ = _parse_source_type(source_column_type)
        if base in MYSQL_TO_SPARK:
            return mysql_to_spark_type(source_column_type)
    return debezium_to_spark_type(debezium_type)
