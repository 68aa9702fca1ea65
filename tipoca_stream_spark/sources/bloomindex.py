"""Bloom-indexed tables: per-file Bloom filters = file-level skipping for
POINT lookups on columns the layout can't serve.

Zone maps (sources/zonemap.py) skip files on RANGE predicates over the
clustering column; they are useless for equality probes on a column
uncorrelated with the layout (every file's [min, max] spans the probe).
That is exactly the reference's DISTKEY-miss case — a PK lookup on a
table sorted by time. Parquet/ORC/Delta/Iceberg all grew per-file Bloom
filters for this; this module is that feature for the repo's parquet
tables, built and probed entirely engine-side:

- **build** (one column-pruned pass, no driver materialization): each row
  emits its k probe positions via the engine's own ``xxhash64(key, i)``;
  positions become (word_idx = pos >> 6, mask = 1 << (pos & 63)) pairs
  and a ``bit_or`` aggregate per (file, word_idx) folds them into 64-bit
  words. The sidecar under ``<path>/_bloom/`` is the SPARSE set of
  non-zero words (≤ m/64 rows per file) — an absent word ≡ an all-zero
  word, so sparsity loses nothing.
- **probe**: the lookup value's k positions are computed BY THE ENGINE
  too (a 1-row job through the identical expression builder — no Python
  re-hash to drift from the JVM's xxhash64), then a file qualifies only
  if every probed word covers its mask. Qualifying paths (the true
  file(s) plus ~FP-rate of the rest) feed a pruned scan with the residual
  equality filter — correctness NEVER depends on the filter, only
  scheduling, the same contract as the zone maps.

Sizing: with m bits/file and n keys/file, FP rate ≈ (1 - e^(-kn/m))^k;
the defaults (m = 2^16, k = 5) hold ~6.5k keys/file at ≲2% FP. At 100 TB
the sidecar is ~1 KB per data file — a metadata read, never a scan.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def probe_structs(m_bits: int, k: int) -> list:
    """k (word_idx, mask) struct columns over a key column named ``k`` —
    the ONE definition of the probe hash, used by both the build and the
    lookup so they can never disagree. shiftleft takes a column argument
    in SQL (only the Python wrapper restricts it to a literal), hence the
    expr for the mask."""
    out = []
    for i in range(k):
        pos = F.pmod(F.xxhash64(F.col("k"), F.lit(i)), F.lit(m_bits))
        out.append(
            F.struct(
                F.shiftright(pos, 6).cast("long").alias("word_idx"),
                F.expr(
                    f"shiftleft(1L, cast(pmod(xxhash64(k, {i}), {m_bits})"
                    f" & 63 AS INT))"
                ).alias("mask"),
            )
        )
    return out


def fold_words(rows: DataFrame, m_bits: int, k: int) -> DataFrame:
    """(file, k) rows → sparse (file, word_idx, word) Bloom words via one
    explode + bit_or aggregate. Executor-side throughout; the caller
    writes the result straight back out."""
    return (
        rows.select("file", F.explode(F.array(*probe_structs(m_bits, k))).alias("p"))
        .select("file", "p.word_idx", "p.mask")
        .groupBy("file", "word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def probe_word_masks(
    spark: SparkSession, value, key_type, m_bits: int, k: int
) -> dict[int, int]:
    """The lookup value's probe (word_idx → OR-ed mask) map, computed BY
    THE ENGINE (a 1-row job through the identical expression builder — no
    Python re-hash to drift from the JVM's xxhash64). xxhash64 is
    TYPE-sensitive (hashing 14999 as INT != as BIGINT): the probe literal
    must carry the key column's exact type or no build bit would match."""
    probe_rows = (
        spark.range(1)
        .select(F.lit(value).cast(key_type).alias("k"))
        .select(F.explode(F.array(*probe_structs(m_bits, k))).alias("p"))
        .select("p.word_idx", "p.mask")
        .collect()
    )
    merged: dict[int, int] = {}
    for r in probe_rows:  # two probes can land in one word: OR the masks
        merged[r["word_idx"]] = merged.get(r["word_idx"], 0) | r["mask"]
    return merged


def covering_files(stats: DataFrame, merged: dict[int, int]) -> list:
    """Files whose Bloom words cover EVERY probed mask — the candidate
    set (true file(s) + ~FP-rate of the rest). Only qualifying PATHS
    reach the driver (bounded metadata read)."""
    match = reduce(
        lambda a, b: a | b,
        [
            (F.col("word_idx") == F.lit(wi))
            & (F.col("word").bitwiseAND(F.lit(mask)) == F.lit(mask))
            for wi, mask in merged.items()
        ],
    )
    cand = (
        stats.filter(match)
        .groupBy("file")
        .agg(F.count("*").alias("n_ok"))
        .filter(F.col("n_ok") == F.lit(len(merged)))
    )
    return [r["file"] for r in cand.select("file").collect()]


class BloomIndexedTable:
    """``key_col`` is the point-lookup column; ``layout_col`` (optional)
    range-clusters the files for some OTHER access path — the realistic
    setup where blooms earn their keep (time-clustered CDC target, PK
    probes)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_col: str,
        layout_col: str | None = None,
        m_bits: int = 1 << 16,
        k: int = 5,
    ):
        if m_bits % 64:
            raise ValueError("m_bits must be a multiple of 64")
        self.spark = spark
        self.path = path
        self.key_col = key_col
        self.layout_col = layout_col
        self.m_bits = m_bits
        self.k = k

    @property
    def _bloom_path(self) -> str:
        # underscore prefix: hidden from the data scan's file index, the
        # same convention as zonemap's _zones
        return os.path.join(self.path, "_bloom")

    def write(self, df: DataFrame, n_files: int = 8) -> None:
        """Lay out the data (range-clustered on ``layout_col`` when
        given), then fold every key's probe bits into per-(file, word)
        64-bit words with one explode + bit_or aggregate — executor →
        parquet, the driver never holds a filter."""
        writer = (
            df.repartitionByRange(n_files, F.col(self.layout_col))
            if self.layout_col
            else df.repartition(n_files)
        )
        writer.write.mode("overwrite").parquet(self.path)
        rows = (
            self.spark.read.parquet(self.path)
            .select(F.input_file_name().alias("file"), F.col(self.key_col).alias("k"))
            .where(F.col("k").isNotNull())
        )
        (
            fold_words(rows, self.m_bits, self.k)
            # one row per (file, non-zero word): ≤ m/64 per file, ~1 KB
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(self._bloom_path)
        )

    def _stats(self) -> DataFrame:
        return self.spark.read.parquet(self._bloom_path)

    def candidate_files(self, value) -> list[str]:
        """Files that may contain ``value``: every probed word must cover
        its mask. Probe positions come from a 1-row engine job; only
        qualifying PATHS reach the driver (bounded metadata read)."""
        key_type = self.read().schema[self.key_col].dataType
        merged = probe_word_masks(self.spark, value, key_type, self.m_bits, self.k)
        return covering_files(self._stats(), merged)

    def read_point(self, value) -> DataFrame:
        """Rows with key == value, scanning only bloom-qualifying files.
        The residual equality filter makes false positives harmless."""
        pred = F.col(self.key_col) == F.lit(value)
        files = self.candidate_files(value)
        if not files:
            return self.spark.read.parquet(self.path).limit(0)
        df = self.spark.read.option("basePath", self.path).parquet(*files)
        return df.filter(pred)

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)
