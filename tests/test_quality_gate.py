"""Quality gate: rules detect seeded violations, clean data passes, and
assert_clean raises with the offending rule names."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tipoca_stream_spark.operators import quality_gate as dq

SCHEMA = "id long, price double, status string"

DIRTY = [
    (1, 10.0, "F"),
    (1, -5.0, "O"),      # dup id + negative price
    (None, 20.0, "Z"),   # null id + bad status
    (3, None, "F"),      # null price is NOT a range violation
]


def counts(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    rules = [
        dq.not_null("id"),
        dq.in_range("price", 0.0, 100.0),
        dq.in_set("status", ["F", "O", "P"]),
    ]
    return {
        r["rule"]: r["n_violations"]
        for r in dq.violation_counts(df, rules, unique_keys=["id"]).collect()
    }


def test_detects_each_violation_kind(spark):
    c = counts(spark, DIRTY)
    assert c == {
        "id_not_null": 1,
        "price_in_range": 1,
        "status_in_set": 1,
        "pk_unique": 1,  # one extra row on id=1 (NULL id groups don't dup)
    }


def test_clean_data_is_all_zero(spark):
    c = counts(spark, [(1, 1.0, "F"), (2, 2.0, "O")])
    assert set(c.values()) == {0}


def test_assert_clean_raises_with_rule_names(spark):
    df = spark.createDataFrame(DIRTY, SCHEMA)
    with pytest.raises(ValueError, match="id_not_null"):
        dq.assert_clean(df, [dq.not_null("id")])
    dq.assert_clean(df.filter(F.col("id").isNotNull()), [dq.not_null("id")])


def test_single_scan_for_row_rules(spark):
    # all row-level rules must fuse into one aggregate over ONE scan —
    # stack() unpivot, never a union of per-rule selects
    df = spark.createDataFrame(DIRTY, SCHEMA)
    rules = [dq.not_null("id"), dq.in_range("price", 0.0, 100.0),
             dq.in_set("status", ["F", "O", "P"])]
    plan = dq.violation_counts(df, rules)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") == 1


def test_fk_violations_detects_orphans(spark):
    fact = spark.createDataFrame([(1,), (2,), (9,), (None,)], "k long")
    dim = spark.createDataFrame([(1,), (2,)], "k long")
    row = dq.fk_violations(fact, "k", dim, "k").collect()[0]
    assert (row["rule"], row["n_violations"]) == ("k_fk", 1)  # 9 orphaned; NULL ignored
