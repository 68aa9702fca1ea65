"""Runtime row-level join pruning: with a selective dimension filter,
Spark must inject a bloom-filter semi-filter on the fact side so the big
scan discards non-joining rows before the shuffle. At 100 TB the
application-side threshold (default 10 GB) triggers naturally; the test
forces it to 0 to exercise the rule at test scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tipoca_stream_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"

BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def bloom_conf(spark):
    old = {k: spark.conf.get(k, None) for k in BLOOM_CONFS}
    for k, v in BLOOM_CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_selective_dim_filter_injects_bloom(spark, bloom_conf):
    orders = load_table(spark, SF, "orders").filter(F.col("o_totalprice") > 400000)
    li = load_table(spark, SF, "lineitem")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    plan = j._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom_filter_agg" in plan, plan
    # pruning must not change the result
    plain = (
        load_table(spark, SF, "lineitem")
        .join(
            load_table(spark, SF, "orders").filter(F.col("o_totalprice") > 400000),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert j.count() == plain
