"""tipoca_stream_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of practo/tipoca-stream (RedshiftSink).

The reference system is a Go CDC pipeline: Kafka (Debezium Avro) → mask /
derive columns → batch to S3 → dedupe + merge into Redshift, orchestrated by
a Kubernetes operator. This package re-expresses every one of those
capabilities Spark-first:

- ``sources``    — Debezium envelope decode, Kafka/file readers, batch sinks
                   (ref: pkg/serializer, pkg/kafka, pkg/s3sink)
- ``functions``  — masking suite compiled to Column expressions, temporal
                   normalization, hashing (ref: pkg/transformer/masker,
                   pkg/transformer/debezium/message.go)
- ``operators``  — CDC extract/classify, latest-wins dedupe, staged merge,
                   plus large-scale corpus operators (dedup, similarity,
                   text analysis, multimodal) (ref: pkg/redshiftloader)
- ``schema``     — type mapping MySQL/Debezium→Spark, schema model with
                   PK/sortkey/distkey hints, diff→migration planner
                   (ref: pkg/redshift/redshift.go)
- ``streaming``  — Structured Streaming shell: foreachBatch CDC pipeline,
                   checkpointing, supervisor/lag control plane
                   (ref: cmd/redshiftbatcher, cmd/redshiftloader, controllers/)
- ``plans``      — the query inventory exposed through ``__spark_entry__``

Everything in the hot path is built-in Catalyst expressions (no Python UDFs
for reference parity — see SURVEY.md §2.11); Pandas UDFs appear only in the
genuinely non-relational operators (multimodal decode plumbing).
"""

__version__ = "0.1.0"
