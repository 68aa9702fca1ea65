"""Zone-mapped tables: per-file min/max stats + range layout = file-level
data skipping for predicates partitioning can't serve.

The reference declares ``SORTKEY`` on every Redshift target (sortkey DDL
in sources/jdbc.py D1, from the Debezium schema hints) precisely so the
warehouse's zone maps can skip blocks on range predicates. This module is
the engine-side equivalent for parquet targets, Delta/Iceberg data
skipping reduced to its core:

- **write**: ``repartitionByRange`` on the zone column, so each output
  file owns a tight, nearly-disjoint value range (a random layout gives
  every file min≈global-min/max≈global-max and skips nothing) — this is
  the SORTKEY's physical meaning;
- **stats**: one column-pruned pass aggregates per-file min/max into a
  parquet stats TABLE under ``<path>/_zones/`` (underscore-prefixed, so
  the main scan never sees it — the same trick as Delta's ``_delta_log``).
  The stats never land on the driver at write time; the aggregation's
  output goes executor → parquet.
- **read**: a range predicate is evaluated AS A FILTER ON THE STATS TABLE
  (distributed), and only the surviving file paths are brought to the
  driver to build the pruned scan — the same bounded metadata read Delta
  and Iceberg perform during file skipping. At 10⁵–10⁶ files the driver
  holds the matching paths for one query, never a dict of every zone.

Hive partitioning prunes on LOW-cardinality columns (dates, buckets);
zone maps cover the continuous/high-cardinality ones (timestamps, ids,
amounts) where a directory per value is impossible. At 100 TB a
time-range query over a ts-zone-mapped table schedules the hour it asks
for, not 8k tasks of full scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ZoneMappedTable:
    """``zone_col`` drives the range layout (the clustering/SORTKEY
    column); ``extra_cols`` are additionally tracked in the stats table,
    so predicates on them can skip files too — they prune well when they
    CORRELATE with the layout column (ts↔id, ts↔offset — common in CDC),
    exactly like Redshift zone maps on non-sortkey columns."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        zone_col: str,
        extra_cols: list[str] | None = None,
    ):
        self.spark = spark
        self.path = path
        self.zone_col = zone_col
        self.extra_cols = extra_cols or []

    @property
    def _zones_path(self) -> str:
        # underscore prefix = invisible to Spark's file index for the data
        # scan (hidden-file convention), so stats can live inside the table
        return os.path.join(self.path, "_zones")

    def write(self, df: DataFrame, n_files: int = 8) -> None:
        """Range-cluster on the zone column and persist per-file stats for
        it and every extra column. One extra column-pruned scan aggregates
        the zones (one row per file) straight into the stats table — no
        driver materialization; the write itself is the one range shuffle
        that buys every later read its skipping."""
        df.repartitionByRange(n_files, F.col(self.zone_col)).write.mode(
            "overwrite"
        ).parquet(self.path)
        tracked = [self.zone_col, *self.extra_cols]
        aggs = []
        for c in tracked:
            aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
        (
            self.spark.read.parquet(self.path)
            .select(F.input_file_name().alias("file"), *tracked)
            .groupBy("file")
            .agg(*aggs)
            # one row per data file; a handful of output files is plenty
            # even at 10^6 data files (~100 B/row)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(self._zones_path)
        )

    def _stats(self) -> DataFrame:
        return self.spark.read.parquet(self._zones_path)

    def read_range(self, lo, hi, col: str | None = None) -> DataFrame:
        """Rows with ``col`` (default: the layout column) in [lo, hi] —
        scanning only files whose zone overlaps. Pruning runs as a filter
        over the stats table; only the matching file PATHS reach the
        driver (the bounded metadata read every table format's planner
        does). The residual filter still applies (zones are file-granular);
        correctness never depends on the stats, only speed."""
        col = col or self.zone_col
        c = F.col(col)
        pred = c.between(F.lit(lo), F.lit(hi))
        stats = self._stats()
        if f"min_{col}" not in stats.columns:
            # untracked column: no skipping possible, plain filtered scan
            return self.read().filter(pred)
        # keep a file unless its zone provably misses [lo, hi]; NULL stats
        # (all-null file) compare to NULL → coalesce keeps it, conservative
        disjoint = (F.col(f"max_{col}") < F.lit(lo)) | (F.col(f"min_{col}") > F.lit(hi))
        keep = F.coalesce(~disjoint, F.lit(True))
        files = [r["file"] for r in stats.filter(keep).select("file").collect()]
        if not files:
            return self.spark.read.parquet(self.path).limit(0)
        df = self.spark.read.option("basePath", self.path).parquet(*files)
        return df.filter(pred)

    def read_box(self, ranges: dict) -> DataFrame:
        """Rows inside a hyper-rectangle: ``ranges`` maps column → (lo, hi),
        all conjunctive. A file is kept unless its zone provably misses the
        box on ANY tracked dimension — so every tracked column contributes
        skipping, which is where a Z-ordered layout (sources/zorder.py)
        pays off: its files are small hyper-rectangles and the per-dim
        prunes compose multiplicatively. Untracked columns only add to the
        residual filter. Correctness never depends on the stats."""
        stats = self._stats()
        keep = F.lit(True)
        pred = F.lit(True)
        for col, (lo, hi) in ranges.items():
            pred = pred & F.col(col).between(F.lit(lo), F.lit(hi))
            if f"min_{col}" in stats.columns:
                disjoint = (F.col(f"max_{col}") < F.lit(lo)) | (
                    F.col(f"min_{col}") > F.lit(hi)
                )
                keep = keep & F.coalesce(~disjoint, F.lit(True))
        files = [r["file"] for r in stats.filter(keep).select("file").collect()]
        if not files:
            return self.spark.read.parquet(self.path).limit(0)
        df = self.spark.read.option("basePath", self.path).parquet(*files)
        return df.filter(pred)

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)
