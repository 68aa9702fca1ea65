"""Non-degeneracy pins for the literal-quantizer ANN families.

Round-8 audit finding: oracle equality alone cannot catch a DEGENERATE
regime — the IVF seed centroids (norm ~8 vs unit-norm data) put every
vector in one cell, and the PQ codewords (norm ~√SUB vs ~√(SUB/DIM)
subvectors) encoded the whole corpus with one code in subspace 0, and
both families still hash-matched their oracles for seven rounds. These
tests pin the DISTRIBUTIONAL contract: the quantizers must actually
partition the data, so a future literal/seed change that collapses the
cells fails loudly instead of grading green."""

from __future__ import annotations

from collections import Counter

SF_DIR = "/root/testdata/sf0.001"


def test_ivf_cells_actually_partition(spark):
    from tipoca_stream_spark.plans import QUERIES
    from tipoca_stream_spark.plans.extended import N_CENTROIDS

    rows = QUERIES["similarity_ivf_assign"].fn(spark, SF_DIR).collect()
    counts = Counter(r["centroid_id"] for r in rows)
    assert len(counts) >= N_CENTROIDS // 2, f"cells collapsed: {dict(counts)}"
    # no single cell may hold (almost) everything — the one-cell regime
    # makes candidates ≈ the corpus and recall trivially perfect
    assert max(counts.values()) < 0.8 * len(rows), f"hot cell: {dict(counts)}"


def test_pq_codes_actually_quantize(spark):
    from tipoca_stream_spark.plans import QUERIES
    from tipoca_stream_spark.plans.pq import K, M

    rows = QUERIES["similarity_pq_codes"].fn(spark, SF_DIR).collect()
    for m in range(M):
        counts = Counter(r[f"code_{m}"] for r in rows)
        assert len(counts) >= K // 2, f"subspace {m} collapsed: {dict(counts)}"
        assert max(counts.values()) < 0.8 * len(rows), (
            f"subspace {m} hot code: {dict(counts)}"
        )


def test_ivf_recall_nontrivial(spark):
    # with real cells, single-probe recall must NOT be trivially perfect
    # (1.0 was the smoking gun of the one-cell regime: candidates were
    # the entire corpus, so "approximate" search was exact by accident);
    # 0.0 is legitimate at tiny SF — one probed cell of 8 can miss all
    # ten true neighbors of a random unit vector
    from tipoca_stream_spark.plans import QUERIES

    row = QUERIES["similarity_ivf_recall"].fn(spark, SF_DIR).collect()[0]
    assert row["recall_at_10"] < 1.0, row
