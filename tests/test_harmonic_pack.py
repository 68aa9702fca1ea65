"""Invariants of operators/packing.py harmonic_pack — capacity-aware
whole-document bin packing (the fewer-truncations layout).

The oracle sweep (tests/test_queries_oracle.py::pack_bins_harmonic) pins
the registered query against DuckDB; these tests pin the OPERATOR's
guarantees directly, including the hierarchical-rank ≡ naive-global-window
equivalence on a hostile input (one size class holding ~all rows — the
case the two-level scan exists for: Window.partitionBy(cls) would put the
whole corpus in one task)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from tipoca_stream_spark.operators.packing import harmonic_pack

CAP = 64


def _lengths(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_eff long")


def test_every_doc_placed_once_and_capacity_respected(spark):
    import random

    rng = random.Random(7)
    rows = [(i, rng.randint(1, CAP)) for i in range(1500)]
    out = harmonic_pack(_lengths(spark, rows), CAP).collect()
    assert sorted(r["doc_id"] for r in out) == [i for i, _ in rows]
    bins: dict[tuple[int, int], list] = {}
    for r in out:
        bins.setdefault((r["cls"], r["bin_idx"]), []).append(r)
    for (cls, _), members in bins.items():
        assert sum(m["n_eff"] for m in members) <= CAP
        assert len(members) <= cls
        assert sorted(m["pos_in_bin"] for m in members) == list(range(len(members)))


def test_only_last_bin_per_class_partial_and_fill_bound(spark):
    import random

    rng = random.Random(11)
    rows = [(i, rng.randint(1, CAP)) for i in range(2000)]
    out = harmonic_pack(_lengths(spark, rows), CAP).collect()
    per_class: dict[int, dict[int, list]] = {}
    for r in out:
        per_class.setdefault(r["cls"], {}).setdefault(r["bin_idx"], []).append(r)
    for cls, bins in per_class.items():
        last = max(bins)
        for idx, members in bins.items():
            if idx != last:
                assert len(members) == cls
                # every member of class k is > capacity/(k+1), so a full
                # shelf is filled past capacity·k/(k+1)
                assert sum(m["n_eff"] for m in members) * (cls + 1) > CAP * cls


def test_hot_class_matches_naive_global_window(spark):
    # 3000 docs in ONE size class (plus a sprinkle elsewhere): the regime
    # where the naive plan is a single-task sort. The hierarchical ranks
    # must still equal the naive global-window bin assignment exactly.
    rows = [(i, 9) for i in range(3000)] + [(10_000 + i, 33 + i % 20) for i in range(60)]
    df = _lengths(spark, rows)
    got = {
        r["doc_id"]: (r["cls"], r["bin_idx"], r["pos_in_bin"])
        for r in harmonic_pack(df, CAP).collect()
    }
    naive = (
        df.withColumn("cls", F.floor(F.lit(CAP) / F.col("n_eff")))
        .withColumn(
            "r0",
            F.row_number().over(
                Window.partitionBy("cls").orderBy(F.col("n_eff").desc(), "doc_id")
            )
            - 1,
        )
        .select(
            "doc_id",
            "cls",
            F.expr("r0 div cls").alias("bin_idx"),
            (F.col("r0") % F.col("cls")).alias("pos_in_bin"),
        )
        .collect()
    )
    want = {r["doc_id"]: (r["cls"], r["bin_idx"], r["pos_in_bin"]) for r in naive}
    assert got == want


def test_empty_input(spark):
    out = harmonic_pack(_lengths(spark, []), CAP)
    assert out.count() == 0
    assert set(out.columns) >= {"doc_id", "n_eff", "cls", "bin_idx", "pos_in_bin"}


def test_bad_capacity_rejected(spark):
    with pytest.raises(ValueError):
        harmonic_pack(_lengths(spark, [(1, 1)]), 0)
