"""Query inventory exposed through ``__spark_entry__``.

Each entry pairs a Spark DataFrame builder with an equivalent ANSI-SQL
oracle that DuckDB runs on the same parquet tables (the driver's
correctness gate, CORRECTNESS_r{N}.json). Import order matters only in
that the submodules register themselves on import.
"""

from tipoca_stream_spark.plans.registry import QUERIES, QueryDef, query

# registration side effects
from tipoca_stream_spark.plans import relational as _relational  # noqa: F401
from tipoca_stream_spark.plans import training as _training  # noqa: F401
from tipoca_stream_spark.plans import extended as _extended  # noqa: F401
from tipoca_stream_spark.plans import temporal_ops as _temporal_ops  # noqa: F401
from tipoca_stream_spark.plans import quality as _quality  # noqa: F401
from tipoca_stream_spark.plans import range_ops as _range_ops  # noqa: F401
from tipoca_stream_spark.plans import surface2 as _surface2  # noqa: F401
from tipoca_stream_spark.plans import clustering as _clustering  # noqa: F401
from tipoca_stream_spark.plans import timeseries as _timeseries  # noqa: F401
from tipoca_stream_spark.plans import sampling as _sampling  # noqa: F401
from tipoca_stream_spark.plans import tpch as _tpch  # noqa: F401
from tipoca_stream_spark.plans import textvec as _textvec  # noqa: F401
from tipoca_stream_spark.plans import mix as _mix  # noqa: F401
from tipoca_stream_spark.plans import analytics as _analytics  # noqa: F401
from tipoca_stream_spark.plans import graph as _graph  # noqa: F401
from tipoca_stream_spark.plans import mlstats as _mlstats  # noqa: F401
from tipoca_stream_spark.plans import pq as _pq  # noqa: F401

__all__ = ["QUERIES", "QueryDef", "query"]
