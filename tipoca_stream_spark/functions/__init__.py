from tipoca_stream_spark.functions.hashing import masked_hash
from tipoca_stream_spark.functions.masking import MaskConfig, TableMaskRules, apply_mask
from tipoca_stream_spark.functions.temporal import (
    debezium_date,
    debezium_datetime_millis,
    debezium_datetime_micros,
    debezium_time_micros,
    debezium_timestamp_iso,
)

__all__ = [
    "MaskConfig",
    "TableMaskRules",
    "apply_mask",
    "masked_hash",
    "debezium_date",
    "debezium_datetime_millis",
    "debezium_datetime_micros",
    "debezium_time_micros",
    "debezium_timestamp_iso",
]
