"""Temperature mixture sampling (operators/mixture.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tipoca_stream_spark.operators import mixture


def _docs(spark, sizes: dict[str, int]):
    rows = []
    i = 0
    for src, n in sorted(sizes.items()):
        for _ in range(n):
            rows.append((i, src))
            i += 1
    return spark.createDataFrame(rows, ["doc_id", "source"])


def test_realized_copies_match_rate_within_one(spark):
    sizes = {"rare": 40, "mid": 160, "common": 640}
    docs = _docs(spark, sizes)
    samp = mixture.temperature_sample(docs, "source", "doc_id", 0.5, 8.0, "t-v1")
    per = {
        r["source"]: r["n"]
        for r in samp.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for src, n in sizes.items():
        rate = round(8.0 * math.pow(n, 0.5) / n, 9)
        expected = n * rate
        # hash selection is uniform-ish, not exact: allow binomial slack
        frac = rate - math.floor(rate)
        slack = 4 * math.sqrt(n * frac * (1 - frac)) + 1
        assert abs(per[src] - expected) <= slack, (src, per[src], expected)


def test_deterministic_and_epochs_well_formed(spark):
    docs = _docs(spark, {"a": 30, "b": 300})
    args = (docs, "source", "doc_id", 0.5, 10.0, "t-v2")
    r1 = sorted(r.asDict().items() for r in mixture.temperature_sample(*args).collect())
    r2 = sorted(r.asDict().items() for r in mixture.temperature_sample(*args).collect())
    assert r1 == r2
    # epochs are 1..n_copies per doc: no epoch 0 (the sequence(1,0)
    # descending-array regression), no gaps
    by_doc: dict[int, list[int]] = {}
    for row in r1:
        d = dict(row)
        by_doc.setdefault(d["doc_id"], []).append(d["epoch"])
    for doc_id, epochs in by_doc.items():
        assert sorted(epochs) == list(range(1, len(epochs) + 1)), doc_id


def test_downsampled_source_emits_at_most_one_copy_each(spark):
    docs = _docs(spark, {"big": 500})
    samp = mixture.temperature_sample(docs, "source", "doc_id", 0.5, 8.0, "t-v3")
    rows = samp.collect()
    # rate = 8/sqrt(500) ≈ 0.358 < 1: every kept doc exactly once
    assert 0 < len(rows) < 500
    assert all(r["epoch"] == 1 for r in rows)
    assert len({r["doc_id"] for r in rows}) == len(rows)


def test_temperature_flattens_mix(spark):
    sizes = {"rare": 50, "common": 800}
    docs = _docs(spark, sizes)
    samp = mixture.temperature_sample(docs, "source", "doc_id", 0.5, 12.0, "t-v4")
    per = {
        r["source"]: r["n"]
        for r in samp.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    raw_share = sizes["rare"] / sum(sizes.values())
    mixed_share = per["rare"] / sum(per.values())
    assert mixed_share > 2 * raw_share


def test_plan_broadcasts_rates_no_sort_merge(spark):
    docs = _docs(spark, {"a": 20, "b": 80})
    samp = mixture.temperature_sample(docs, "source", "doc_id", 0.5, 8.0, "t-v5")
    plan = samp._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
