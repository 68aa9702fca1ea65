"""Bucketed (hash-clustered) parquet tables — the storage analogue of the
reference's Redshift DISTKEY co-location.

The reference creates every target table with ``DISTSTYLE KEY DISTKEY(col)``
when the Debezium schema carries a distkey hint (pkg/redshift/redshift.go
CreateTable SQL; this repo generates the same DDL in sources/jdbc.py D1):
Redshift then stores rows of all tables sharing that key on the same slice,
so a join on the key never moves data across the network. Spark's equivalent
is a **bucketed table**: ``bucketBy(n, key)`` hash-partitions *files* by
``pmod(hash(key), n)`` at write time and records the layout in the catalog.
A join of two tables bucketed on the join key with the same bucket count
executes with **zero Exchange** — task *i* reads bucket *i* of each side —
and a ``groupBy`` on the bucket key likewise skips its shuffle. An equality
filter on the key prunes to a single bucket (``SelectedBucketsCount`` in the
scan node).

At 100 TB this is the difference that matters most: the fact-fact join
(orders ⋈ lineitem, target ⋈ batch) is the largest shuffle in the pipeline,
and bucketing removes it entirely for every downstream query that joins or
aggregates on the clustering key — the write-once cost is amortized over
every read, exactly the Redshift DISTKEY trade. Size ``buckets`` so one
bucket of the larger table is ~100-500 MB (e.g. 100 TB fact table →
~250k buckets); both sides MUST use the same count or Spark re-shuffles the
smaller side.

``sortBy`` on the same key additionally pre-sorts each bucket file, letting
a sort-merge join skip its per-task Sort as well (the SORTKEY half of the
reference's DDL). Two conditions gate that payoff: each bucket must be a
single file (the writer below guarantees it), and
``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` must be set —
since Spark 3.0 the scan hides its sort order by default because proving
one-file-per-bucket costs a file listing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    buckets: int,
    keys: list[str],
    sort_keys: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a catalog-registered bucketed parquet table.

    The bucket layout lives in the catalog (not the files), so readers must
    go through ``spark.table(name)`` / :func:`read_bucketed` to get the
    shuffle-free plans; reading the parquet directory directly sees plain
    files. ``path`` makes it an external table (data under ``path``,
    layout in the catalog) — on a cluster this is the lake location.
    """
    # One shuffle at write time buys two things: (a) without it every write
    # task emits a file per bucket it sees — tasks × buckets small files at
    # scale; (b) Spark only skips the join-side Sort when each bucket is a
    # SINGLE file (multiple files per bucket aren't globally sorted).
    # repartition uses the same murmur3 hash as the bucket spec, so each
    # task owns exactly one bucket and writes exactly one sorted file.
    df = df.repartition(buckets, *[df[k] for k in keys])
    writer = df.write.mode("overwrite").format("parquet").bucketBy(buckets, *keys)
    writer = writer.sortBy(*(sort_keys or keys))
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Catalog read — the only path that preserves the bucket layout."""
    return spark.table(name)


def co_located_join(
    spark: SparkSession, left: str, right: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys.

    With matching bucket counts this plans as a sort-merge join with no
    Exchange on either side (and no Sort either, when both were written
    ``sortBy`` the join keys) — the Redshift co-located DISTKEY join. The
    helper is a thin wrapper: the *layout* carries the optimization, not
    the call site, so any ``spark.table(a).join(spark.table(b), on)``
    gets the same plan.
    """
    return read_bucketed(spark, left).join(read_bucketed(spark, right), on=on, how=how)
