"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine as the exact baseline, and random-hyperplane LSH as the
scale path (bucketed candidate generation → exact re-rank within buckets).
Everything is built-in higher-order functions (``zip_with`` + ``aggregate``)
— JVM-side, no Python in the loop. The fold over the array is sequential
and deterministic, so scores are bit-identical across engines (the DuckDB
oracle reproduces them exactly).

At 100 TB / billions of vectors: the brute-force path is one broadcast of
the query vector and a full scan (embarrassingly parallel, no shuffle); the
LSH path shuffles only (vec_id, bucket) pairs, then re-ranks within buckets.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Deterministic left-fold dot product of two array<float/double> cols."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against the embedding of ``query_id``.
    The 1-row query side is broadcast; ranking is a global top-k
    (TakeOrderedAndProject — per-partition heaps, no full sort)."""
    q = embeddings.filter(F.col(id_col) == query_id).select(F.col(vec_col).alias("_q"))
    scored = (
        embeddings.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), F.col("_q")), 6).alias("sim"),
        )
    )
    return scored.orderBy(F.col("sim").desc(), F.col(id_col)).limit(k)


def cosine_neardup_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs above a cosine threshold (exact verification stage; feed it
    LSH buckets at scale instead of the cross join)."""
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def random_hyperplanes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes (stdlib RNG so the exact literals
    can be embedded in both the Spark plan and the SQL oracle)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit p = 1 iff dot(vec, plane_p) > 0."""
    acc = F.lit(0)
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        acc = acc + F.when(_dot(vec, lit_plane) > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return acc.cast("int")


def lsh_buckets(
    embeddings: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    return embeddings.select(F.col(id_col), lsh_bucket(F.col(vec_col), planes).alias("bucket"))


def lsh_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket, then
    exact cosine re-rank. Recall trades off with plane count."""
    with_bucket = embeddings.withColumn("bucket", lsh_bucket(F.col(vec_col), planes))
    q = with_bucket.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_q"), F.col("bucket")
    )
    cands = with_bucket.join(F.broadcast(q), "bucket").filter(F.col(id_col) != query_id)
    return (
        cands.select(F.col(id_col), F.round(cosine(F.col(vec_col), F.col("_q")), 6).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )
