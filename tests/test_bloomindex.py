"""BloomIndexedTable: point-lookup file skipping off a per-file Bloom
sidecar built with one explode + bit_or aggregate (sources/bloomindex.py).

Pins: (1) answers equal a plain filtered scan for present and absent
keys (false positives harmless, false negatives impossible); (2) the
probe actually prunes — candidate files are a strict subset that still
covers every file truly holding the key; (3) the build and probe share
one hash definition, including the key-TYPE sensitivity of xxhash64;
(4) string keys work (different physical hashing path than longs)."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from tipoca_stream_spark.sources.bloomindex import BloomIndexedTable


@pytest.fixture(scope="module")
def indexed(spark, sf_dir, tmp_path_factory):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    root = str(tmp_path_factory.mktemp("bloom")) + "/li"
    t = BloomIndexedTable(
        spark, root, key_col="l_orderkey", layout_col="l_shipdate",
        m_bits=1 << 16, k=5,
    )
    t.write(li, n_files=16)
    return t, li, root


def test_point_read_matches_plain_filter(spark, indexed):
    t, li, _ = indexed
    keys = [r["l_orderkey"] for r in li.select("l_orderkey").distinct().limit(5).collect()]
    for key in keys:
        got = sorted(r["l_linenumber"] for r in t.read_point(key).collect())
        want = sorted(
            r["l_linenumber"]
            for r in li.filter(F.col("l_orderkey") == key).collect()
        )
        assert got == want and len(got) > 0


def test_absent_key_returns_empty(spark, indexed):
    t, _, _ = indexed
    assert t.read_point(-1).count() == 0


def test_candidates_prune_but_cover_true_files(spark, indexed):
    t, li, root = indexed
    total = len(glob.glob(root + "/part-*.parquet"))
    key = li.agg(F.max("l_orderkey")).collect()[0][0]
    cands = set(t.candidate_files(key))
    assert 0 < len(cands) < total, "bloom must prune at least one file"
    # every file truly holding the key must survive (no false negatives)
    true_files = {
        r["f"]
        for r in spark.read.parquet(root)
        .select(F.input_file_name().alias("f"), "l_orderkey")
        .filter(F.col("l_orderkey") == key)
        .select("f")
        .distinct()
        .collect()
    }
    assert true_files <= cands


def test_probe_uses_key_column_type(spark, indexed):
    # xxhash64 hashes INT and BIGINT differently; the probe literal is a
    # Python int but must match the BIGINT build hashing — a present key
    # must qualify its files (would be 0 candidates if types diverged)
    t, li, _ = indexed
    key = int(li.agg(F.min("l_orderkey")).collect()[0][0])
    assert len(t.candidate_files(key)) > 0


def test_string_keys(spark, tmp_path):
    df = spark.createDataFrame(
        [(f"user-{i}", i % 7) for i in range(2000)], "uid string, shard int"
    )
    t = BloomIndexedTable(
        spark, str(tmp_path / "s"), key_col="uid", layout_col="shard",
        m_bits=1 << 12, k=4,
    )
    t.write(df, n_files=8)
    assert t.read_point("user-1234").count() == 1
    assert t.read_point("user-9999").count() == 0
    total = len(glob.glob(str(tmp_path / "s") + "/part-*.parquet"))
    assert len(t.candidate_files("user-1234")) < total


def test_m_bits_must_be_word_aligned(spark, tmp_path):
    with pytest.raises(ValueError):
        BloomIndexedTable(spark, str(tmp_path / "x"), key_col="k", m_bits=100)
