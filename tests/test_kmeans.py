"""k-means trainer: Lloyd-step invariants on the real embeddings table."""

from __future__ import annotations

import pytest

from tipoca_stream_spark.operators.kmeans import (
    assign_to_centroids,
    inertia,
    kmeans_train,
    lloyd_step,
)
from tipoca_stream_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embs(spark):
    return load_table(spark, SF_DIR, "embeddings").persist()


def test_lloyd_never_increases_inertia(spark, embs):
    init = kmeans_train(embs, k=4, n_iter=0)
    prev = inertia(embs, init)
    c = init
    for _ in range(3):
        c = lloyd_step(embs, c)
        cur = inertia(embs, c)
        assert cur <= prev + 1e-6, f"inertia rose: {prev} -> {cur}"
        prev = cur


def test_assignment_is_total_and_in_range(spark, embs):
    c = kmeans_train(embs, k=4, n_iter=1)
    a = assign_to_centroids(embs, c)
    n = embs.count()
    assert a.count() == n
    ids = {r["centroid_id"] for r in a.select("centroid_id").distinct().collect()}
    assert ids <= set(range(4))


def test_train_produces_k_centroids_of_right_dim(spark, embs):
    c = kmeans_train(embs, k=3, n_iter=2)
    assert len(c) == 3
    assert all(len(v) == 64 for v in c)
    # centroids moved away from their raw init vectors
    init = kmeans_train(embs, k=3, n_iter=0)
    assert c != init
