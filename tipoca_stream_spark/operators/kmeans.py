"""Distributed k-means (Lloyd's algorithm) over an embedding column — the
training step that produces the IVF coarse quantizer's centroids
(``plans/extended.py`` consumes fixed centroids; this is where real ones
come from).

Scale shape per iteration:
- **assignment** is a narrow pass: k squared-distance expressions per row
  (``zip_with`` + ``aggregate``, JVM-side), argmin via chained ``when`` —
  no shuffle, no UDF.
- **update** aggregates dim×k partial sums with one hash aggregate: the
  per-dimension sums are ``sum(element_at(vec, i))`` columns, so the
  shuffle carries k rows of (count + dim sums), never the vectors.
- centroids (k×dim floats) live on the driver between iterations — the
  classic broadcast-model iteration; at 100 TB the data never moves, only
  the k×dim table does.

The synthetic fallback for empty clusters keeps the old centroid (standard
Lloyd behavior); convergence is monitored by inertia, which is
non-increasing for exact Lloyd steps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _d2(vec_col, centroid: list[float]):
    return F.aggregate(
        F.zip_with(
            F.col(vec_col),
            F.array(*[F.lit(float(x)) for x in centroid]),
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_to_centroids(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, centroid_id, d2): nearest centroid by squared L2, ties to the
    lower index (matches the IVF quantizer's argmin).

    Argmin via array_min + first-occurrence array_position — LINEAR-size
    expressions in k. The previous chained-``when`` form embedded each
    running best twice per step (``best_d_i = when(d_i < best_d_{i-1},
    ...).otherwise(best_d_{i-1})`` with the condition holding its own
    copy), doubling the expression tree per centroid: 2^k nodes, which
    OOMed the ANALYZER around k ≈ 25 (found by the round-9 maintenance
    soak the moment a grown quantizer crossed that k — the registered
    IVF's fixed k=8 never tripped it). First-occurrence position keeps
    the lower-index tie-break bit-identical to the old form."""
    with_d = emb.select(
        id_col,
        vec_col,
        *[_d2(vec_col, c).alias(f"_d{i}") for i, c in enumerate(centroids)],
    )
    d_arr = F.array(*[F.col(f"_d{i}") for i in range(len(centroids))])
    best_d = F.array_min(d_arr)
    best = (F.array_position(d_arr, best_d) - 1).cast("int")
    return with_d.select(
        id_col, vec_col, best.alias("centroid_id"), best_d.alias("d2")
    )


def lloyd_step(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """One Lloyd update: assign, then per-cluster mean. Returns the new
    centroid table (empty clusters keep their old centroid)."""
    dim = len(centroids[0])
    assigned = assign_to_centroids(emb, centroids, id_col, vec_col)
    sums = assigned.groupBy("centroid_id").agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.element_at(F.col(vec_col), i + 1).cast("double")).alias(f"s{i}")
            for i in range(dim)
        ],
    )
    new = [list(c) for c in centroids]
    for row in sums.collect():
        cid, n = row["centroid_id"], row["n"]
        new[cid] = [row[f"s{i}"] / n for i in range(dim)]
    return new


def inertia(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """Sum of squared distances to the assigned centroid (the k-means
    objective; exact Lloyd steps never increase it)."""
    return (
        assign_to_centroids(emb, centroids, id_col, vec_col)
        .agg(F.sum("d2"))
        .collect()[0][0]
    )


def kmeans_train(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Train k centroids with deterministic init (the k lowest-id vectors —
    reproducible across runs and partitionings, unlike sampled init)."""
    init_rows = emb.orderBy(id_col).limit(k).select(vec_col).collect()
    centroids = [[float(x) for x in r[vec_col]] for r in init_rows]
    for _ in range(n_iter):
        centroids = lloyd_step(emb, centroids, id_col, vec_col)
    return centroids
