from tipoca_stream_spark.operators.cdc import (
    OP_CREATE,
    OP_DELETE,
    OP_UPDATE,
    classify_operation,
    extract_row_image,
    skip_tombstones,
)
from tipoca_stream_spark.operators.dedupe import latest_wins
from tipoca_stream_spark.operators.merge import cdc_merge, merge_into_target

__all__ = [
    "OP_CREATE",
    "OP_UPDATE",
    "OP_DELETE",
    "classify_operation",
    "extract_row_image",
    "skip_tombstones",
    "latest_wins",
    "cdc_merge",
    "merge_into_target",
]
