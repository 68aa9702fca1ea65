"""Bucketed-table plan shapes: the DISTKEY co-location story must hold in
the physical plan, not just in the docstring — a join or aggregate on the
bucket key may not shuffle, and a key-equality filter must prune buckets."""

from __future__ import annotations

import contextlib
import io
import re

import pytest
from pyspark.sql import functions as F

from tipoca_stream_spark.sources.bucketed import co_located_join, read_bucketed, write_bucketed
from tipoca_stream_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    write_bucketed(load_table(spark, SF, "orders"), "b_orders", 8, ["o_orderkey"])
    write_bucketed(
        load_table(spark, SF, "lineitem"),
        "b_lineitem",
        8,
        ["l_orderkey"],
        sort_keys=["l_orderkey"],
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


@pytest.fixture()
def no_broadcast(spark):
    # force the join to actually exercise the bucketed path — a broadcast
    # would make the "no Exchange" assertion vacuous on sf0.001
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_co_located_join_has_no_exchange(spark, bucketed_tables, no_broadcast):
    j = co_located_join(
        spark,
        "b_orders",
        "b_lineitem",
        on=[F.col("o_orderkey") == F.col("l_orderkey")],
    )
    plan = plan_of(j)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    # correctness of the zipped-bucket execution, not just the plan shape
    expected = (
        load_table(spark, SF, "orders")
        .join(load_table(spark, SF, "lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
        .count()
    )
    assert j.count() == expected


def test_sorted_buckets_skip_the_sort(spark, bucketed_tables, no_broadcast):
    # both tables were written sortBy their bucket key with one file per
    # bucket; with the legacy output-ordering knob on, the SMJ consumes the
    # files pre-sorted — zero Sort nodes (vs two with the knob off)
    def n_sorts() -> int:
        j = read_bucketed(spark, "b_lineitem").join(
            read_bucketed(spark, "b_orders"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        return len(re.findall(r"^\(\d+\) Sort$", plan_of(j), re.M))

    assert n_sorts() == 2
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        assert n_sorts() == 0
    finally:
        spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")


def test_groupby_on_bucket_key_has_no_exchange(spark, bucketed_tables):
    agg = (
        read_bucketed(spark, "b_lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    plan = plan_of(agg)
    assert "Exchange" not in plan, plan
    oracle = (
        load_table(spark, SF, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    assert sorted(map(tuple, agg.collect())) == sorted(map(tuple, oracle.collect()))


def test_key_filter_prunes_to_one_bucket(spark, bucketed_tables):
    # autoBucketedScan turns the bucketed scan off when no join/agg uses the
    # layout, which also forfeits bucket pruning — pin it on for the check
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        any_key = read_bucketed(spark, "b_orders").select("o_orderkey").head()[0]
        df = read_bucketed(spark, "b_orders").filter(F.col("o_orderkey") == any_key)
        plan = plan_of(df)
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
