"""Exact heavy hitters (frequent items) via candidate pruning.

The reference's analytics surface stops at GROUP BY counts
(`redshift.go` generates plain aggregates); frequent-item mining is a
training-data-pipeline extension (vocabulary caps, hot-key discovery,
boilerplate detection all reduce to "items with frequency > n/k").

Why not just ``groupBy(item).count().filter(cnt > n/k)``? That plan's
shuffle is one row per (map partition, distinct item) after partial
aggregation — at 100 TB with billions of distinct items (URLs, shingles,
n-grams) the shuffle is dominated by the long tail of items that can
never qualify. This operator prunes the tail BEFORE the exchange:

1. **Candidate pass** (Arrow ``mapInPandas``, no shuffle): each input
   partition computes exact local counts (vectorized ``value_counts``)
   and emits only items with local_count > local_rows / k. If an item's
   global frequency exceeds n/k then in at least one partition its local
   frequency exceeds n_p/k (else summing the contrary over partitions
   contradicts the premise), so the union of local survivors is a
   guaranteed superset of the global answer. At most k candidates per
   partition — the emitted set is tiny by construction.
2. **Verify pass**: exact ``groupBy`` count restricted (broadcast
   semi-join) to candidate items, then filter by the global threshold.
   Only rows of candidate items reach the exchange, and partial
   aggregation collapses them to <= candidates x partitions rows.

The result is EXACT — identical to the naive plan, which is what the
DuckDB oracle runs — with a shuffle bounded by the candidate set instead
of the item cardinality. This is the sketch-then-verify discipline used
by the MinHash/SimHash dedup family (corpus_dedup.py): approximate
structure finds a small superset, exact arithmetic confirms it.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(items: DataFrame, item_col: str, k: int) -> DataFrame:
    """Return ``(item, cnt)`` for every item with count > n/k (exact).

    ``items`` may have any schema; only ``item_col`` is read (column
    pruning pushes the projection into the scan). NULL items are ignored
    (no meaningful frequency contract; mirrors GROUP BY + HAVING which
    would count them — callers filter NULLs upstream if they matter).
    """
    src = items.select(F.col(item_col).alias("item")).where(F.col("item").isNotNull())
    out_schema = src.schema

    def local_candidates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Exact per-partition counts, accumulated across Arrow batches —
        # one dict of (item -> count) per partition, vectorized per batch.
        counts: dict = {}
        n_local = 0
        for batch in batches:
            n_local += len(batch)
            vc = batch["item"].value_counts()
            for item, cnt in vc.items():
                counts[item] = counts.get(item, 0) + int(cnt)
        if n_local == 0:
            return
        thresh = n_local / k
        survivors = [item for item, cnt in counts.items() if cnt > thresh]
        yield pd.DataFrame({"item": pd.Series(survivors, dtype=batch["item"].dtype)})

    candidates = src.mapInPandas(local_candidates, out_schema).distinct()
    total = src.agg(F.count("*").alias("n_total"))  # 1-row broadcast
    exact = (
        src.join(F.broadcast(candidates), "item", "left_semi")
        .groupBy("item")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .where(F.col("cnt") > F.col("n_total") / F.lit(float(k)))
        .select("item", "cnt")
    )
