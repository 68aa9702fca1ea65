"""Benchmark-contamination screening: flag TRAIN documents that share
word n-grams with a held-out TEST/benchmark set — the decontamination
pass every serious LLM training pipeline runs before training (the
GPT-3 paper's 13-gram dedup and PaLM's n-gram contamination analysis
are the canonical public descriptions; the exact n is a knob).

Reference contrast: tipoca-stream has no content-level operators (its
dedup is PK latest-wins, pkg/redshiftloader/load_processor.go); this is
a training-pipeline extension in the MinHash/SimHash family
(operators/corpus_dedup.py), reusing its shingle explode.

100 TB shape: the benchmark side is TINY (a test suite is at most a few
million distinct shingles) while the train side is the corpus — so the
join MUST broadcast the test shingle set and stream the train side
through it with no train-side shuffle for candidate generation. The
only shuffles are keyed on doc_id (the per-doc distinct + aggregates),
which AQE handles at any scale. Never join train-to-train here: that is
the dedup family's job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tipoca_stream_spark.operators.corpus_dedup import word_shingles


def contamination_screen(
    train: DataFrame,
    test: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
) -> DataFrame:
    """(doc_id, shared_ngrams, total_ngrams, contamination) for each
    TRAIN document sharing at least one word n-gram with any TEST
    document: shared/total are DISTINCT shingle counts within the doc,
    contamination = shared/total rounded to 6 — the per-doc score a
    curation gate thresholds on (drop, or route to manual review)."""
    tr = (
        word_shingles(train, text_col, id_col, n)
        .select(id_col, F.col("shingle").alias("s"))
        .distinct()
    )
    te = (
        word_shingles(test, text_col, id_col, n)
        .select(F.col("shingle").alias("s"))
        .distinct()
    )
    tot = tr.groupBy(id_col).agg(F.count(F.lit(1)).alias("total_ngrams"))
    shared = (
        tr.join(F.broadcast(te), "s")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
    )
    return shared.join(tot, id_col).select(
        id_col,
        "shared_ngrams",
        "total_ngrams",
        F.round(
            F.col("shared_ngrams") / F.col("total_ngrams").cast("double"), 6
        ).alias("contamination"),
    )
