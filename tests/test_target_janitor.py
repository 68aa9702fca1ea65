"""Crash-orphan hygiene on the versioned targets (VERDICT r6 worklist #2).

A writer that hard-crashes after ``_claim_version()`` + staging its
``v=<n>`` directory but before ``_flip`` leaves both behind forever. The
orphan holds data NO commit ever published, so:

- ``read(version=n)`` must refuse it (time travel reaches only committed
  versions),
- ``versions()`` must not list it,
- ``vacuum`` must collect it once the claim is stale — while never
  touching a LIVE writer's freshly-claimed staged version.
"""

from __future__ import annotations

import os

import pytest

from tipoca_stream_spark.sources.target import BucketedTargetTable, ParquetTargetTable


def _stage_orphan(spark, t) -> int:
    """Simulate the crash: claim a version, stage real parquet into its
    directory, then stop before any flip."""
    v = t._claim_version()
    from pyspark.sql import functions as F

    spark.range(7).withColumn("poison", F.lit(999)).write.mode(
        "overwrite"
    ).parquet(os.path.join(t.path, f"v={v}"))
    return v


@pytest.fixture()
def table(spark, tmp_path):
    t = ParquetTargetTable(spark, str(tmp_path), "orders_t")
    t.write(spark.range(100).withColumnRenamed("id", "k"))
    t.write(spark.range(200).withColumnRenamed("id", "k"))
    return t


def test_orphan_is_invisible_and_unreadable(spark, table):
    t = table
    current = t.current_version()
    v = _stage_orphan(spark, t)
    assert v > current
    # never-committed data is not a version: not listed, not time-travelable
    assert t.versions() == [current - 1, current]
    with pytest.raises(FileNotFoundError, match="never committed"):
        t.read(version=v)
    # the committed current version still serves normally
    assert t.read().count() == 200


def test_vacuum_collects_stale_orphan_but_spares_live_claim(spark, table):
    t = table
    current = t.current_version()
    v = _stage_orphan(spark, t)
    # a LIVE claim (fresh marker) is a writer mid-stage: janitor keeps out
    assert v not in t.vacuum(claim_ttl_seconds=900.0)
    assert os.path.isdir(os.path.join(t.path, f"v={v}"))
    # once the claim is stale the orphan is collected, marker and all
    removed = t.vacuum(claim_ttl_seconds=0.0)
    assert v in removed
    assert not os.path.isdir(os.path.join(t.path, f"v={v}"))
    assert not os.path.isdir(t._claim_marker(v))
    # committed history untouched (keep=2 retains both)
    assert t.versions() == [current - 1, current]
    assert t.read().count() == 200


def test_vacuum_collects_markerless_orphan(spark, table):
    """A dir above the pointer with NO claim marker at all (e.g. the
    marker was lost with its writer's scratch volume) is nobody's — the
    janitor removes it immediately, regardless of ttl."""
    t = table
    v = _stage_orphan(spark, t)
    t._release_claim(v)  # marker gone, dir remains
    removed = t.vacuum(claim_ttl_seconds=900.0)
    assert v in removed
    assert not os.path.isdir(os.path.join(t.path, f"v={v}"))


def test_next_writer_reuses_nothing_after_vacuum(spark, table):
    """After the janitor runs, a normal commit proceeds and lands above
    the previous pointer — the burned orphan number may be reused now
    that both its directory and claim are gone."""
    t = table
    _stage_orphan(spark, t)
    t.vacuum(claim_ttl_seconds=0.0)
    t.write(spark.range(300).withColumnRenamed("id", "k"))
    assert t.read().count() == 300
    assert t.versions()[-1] == t.current_version()


def test_bucketed_orphan_hygiene(spark, tmp_path):
    """Same contract on the bucketed CDC target (vacuum override also
    drops any catalog entry for the collected versions)."""
    t = BucketedTargetTable(
        spark, str(tmp_path), "docs_t", buckets=4, keys=["k"]
    )
    t.write(spark.range(50).withColumnRenamed("id", "k"))
    current = t.current_version()
    v = _stage_orphan(spark, t)
    assert t.versions() == [current]
    with pytest.raises(FileNotFoundError, match="never committed"):
        t.read(version=v)
    removed = t.vacuum(claim_ttl_seconds=0.0)
    assert v in removed
    assert not os.path.isdir(t._vdir(v))
    assert t.read().count() == 50
