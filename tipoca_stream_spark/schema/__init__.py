from tipoca_stream_spark.schema.model import ColInfo, Table
from tipoca_stream_spark.schema.types import (
    debezium_to_spark_type,
    mysql_to_spark_type,
    resolve_spark_type,
)
from tipoca_stream_spark.schema.migrate import MigrationOp, diff_schemas

__all__ = [
    "ColInfo",
    "Table",
    "debezium_to_spark_type",
    "mysql_to_spark_type",
    "resolve_spark_type",
    "MigrationOp",
    "diff_schemas",
]
