"""Deterministic corpus splitting & sampling — train/eval assignment must
be a pure function of stable ids (reproducible across runs, engines, and
cluster sizes), never `rand()`. The split key is the first 8 hex chars of
md5(doc_id || salt) mod 100: identical arithmetic in Spark and DuckDB, so
the assignment itself is oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tipoca_stream_spark.plans.registry import query
from tipoca_stream_spark.sources.tables import load_table

SPLIT_SALT = "split-v1"
EVAL_PCT = 10  # percent of docs assigned to eval


def _bucket(col, salt: str):
    """0-99 bucket from the top 32 bits of md5(id || salt) — stable under
    repartitioning and engine choice, uniform enough for split purposes."""
    return (
        F.conv(F.substring(F.md5(F.concat(col.cast("string"), F.lit(salt))), 1, 8), 16, 10)
        .cast("long") % 100
    )


@query(
    "corpus_train_split",
    f"""
    SELECT doc_id, source,
           CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR || '{SPLIT_SALT}'), 1, 8))::BIGINT % 100
                     < {EVAL_PCT}
                THEN 'eval' ELSE 'train' END AS split
    FROM documents
    """,
    survey_ref="training: deterministic train/eval split",
)
def corpus_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-salted split assignment: ~10% eval, stable under any
    partitioning. Pure projection — no shuffle, no state, no RNG."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "source",
        F.when(_bucket(F.col("doc_id"), SPLIT_SALT) < EVAL_PCT, "eval")
        .otherwise("train")
        .alias("split"),
    )


@query(
    "corpus_split_balance",
    f"""
    SELECT source, split, count(*) AS n FROM (
      SELECT source,
             CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR || '{SPLIT_SALT}'), 1, 8))::BIGINT % 100
                       < {EVAL_PCT}
                  THEN 'eval' ELSE 'train' END AS split
      FROM documents)
    GROUP BY source, split
    """,
    survey_ref="training: split balance audit",
)
def corpus_split_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source split sizes — the audit query run after any split change
    to confirm stratification didn't skew a source."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "source",
            F.when(_bucket(F.col("doc_id"), SPLIT_SALT) < EVAL_PCT, "eval")
            .otherwise("train")
            .alias("split"),
        )
        .groupBy("source", "split")
        .agg(F.count("*").alias("n"))
    )
