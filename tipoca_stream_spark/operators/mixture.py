"""Temperature-weighted data-mixture sampling with fractional epochs —
the training-mix stage that decides how many copies of each document
enter an LLM training run (upsampling rare sources, downsampling
dominant ones; "temperature" α flattens the source-size distribution,
the standard multilingual/multi-source practice).

Reference parity note: no counterpart in practo/tipoca-stream — part of
the SURVEY.md "beyond the reference" training-pipeline surface,
alongside plans/sampling.py's deterministic split and weighted
reservoir sampler.

Per source s with n_s documents, the per-document expected copy count is

    rate_s = coeff · n_s^α / n_s        (α < 1 boosts small sources)

realized deterministically per document as floor(rate_s) whole copies
plus one extra when the document's uniform hash u < frac(rate_s) — so
the realized per-source total is within 1 of n_s·rate_s, reproducible
across runs, engines, and partitionings (no rand(), the
plans/sampling.py discipline; u = (md5 top-32-bits + 0.5) / 2^32, rates
rounded to 9 dp in ENGINE expressions so Spark and DuckDB compare
identical doubles).

100 TB design: the only corpus pass is a map-side-combined per-source
count (|sources| rows); rates join back as a BROADCAST, and the
copy-explode is a map-only ``explode(sequence(...))`` — the sampler
itself is shuffle-free, so it pipelines into whatever reads it."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import broadcast

U_DENOM = 4294967296.0  # 2^32


def uniform_hash(id_col: Column, salt: str) -> Column:
    """Deterministic u ∈ (0,1): top 32 bits of md5(id || salt)."""
    h = F.conv(
        F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(salt))), 1, 8),
        16,
        10,
    ).cast("long")
    return (h + F.lit(0.5)) / F.lit(U_DENOM)


def source_rates(
    df: DataFrame, source_col: str, alpha: float, coeff: float
) -> DataFrame:
    """(source, n_docs, rate): rate = coeff · n^α / n, rounded to 9 dp in
    engine arithmetic (ROUND_HALF_UP in both Spark and DuckDB)."""
    cnt = df.groupBy(source_col).agg(F.count("*").alias("n_docs"))
    return cnt.select(
        source_col,
        "n_docs",
        F.round(
            F.lit(coeff) * F.pow(F.col("n_docs"), F.lit(alpha)) / F.col("n_docs"),
            9,
        ).alias("rate"),
    )


def temperature_sample(
    df: DataFrame,
    source_col: str,
    id_col: str,
    alpha: float,
    coeff: float,
    salt: str,
) -> DataFrame:
    """df → df rows replicated per the temperature mix, with ``epoch``
    (1-based copy number) and the source's ``rate`` attached. Documents
    hash-selected out (n_copies = 0) are absent."""
    rates = source_rates(df, source_col, alpha, coeff)
    joined = df.join(broadcast(rates), source_col)
    base = F.floor(F.col("rate")).cast("long")
    frac = F.round(F.col("rate") - F.floor(F.col("rate")), 9)
    extra = (
        F.when(uniform_hash(F.col(id_col), salt) < frac, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
    )
    n_copies = (base + extra).alias("n_copies")
    return (
        joined.withColumn("n_copies", n_copies)
        # Spark's sequence(1, 0) yields a DESCENDING [1, 0], not an empty
        # array — zero-copy rows must be filtered before the explode
        .filter(F.col("n_copies") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(1).cast("long"), F.col("n_copies"))))
        .drop("n_copies")
    )
