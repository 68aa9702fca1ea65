"""Semantic (embedding-space) dedup — operators/semantic_dedup.py.

Pins: the candidate-pair join is CLUSTER-CONFINED (keyed on cluster_id —
no cartesian product in the plan; cross-cluster pairs are structurally
impossible), the drop set matches a brute-force all-pairs oracle on the
same threshold, scaled copies always land in their original's cluster
(cosine quantizer is scale-invariant), and a pathologically hot cluster
(every vector in one cell) still answers exactly — the skew probe, not a
skew assumption."""

from __future__ import annotations

import contextlib
import io
import math
import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tipoca_stream_spark.operators.semantic_dedup import assign_by_cosine, semantic_dedup

DIM = 16

SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)


def _vectors(n: int, seed: int = 11) -> list[tuple[int, list[float]]]:
    rng = random.Random(seed)
    return [(i, [rng.gauss(0.0, 1.0) for _ in range(DIM)]) for i in range(n)]


def _cos(a: list[float], b: list[float]) -> float:
    dot = sum(x * y for x, y in zip(a, b))
    return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))


def _brute_force_drops(
    rows: list[tuple[int, list[float]]],
    assign: dict[int, int],
    threshold: float,
) -> dict[int, int]:
    """{dropped_id: dup_of} under the operator's contract: smaller-id
    neighbor in the SAME cluster with round(cos, 6) >= threshold."""
    by_id = dict(rows)
    out: dict[int, int] = {}
    ids = sorted(by_id)
    for j, b in enumerate(ids):
        anchors = [
            a
            for a in ids[:j]
            if assign[a] == assign[b]
            and round(_cos(by_id[a], by_id[b]), 6) >= threshold
        ]
        if anchors:
            out[b] = min(anchors)
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    base = _vectors(120)
    # plant near-dups: every 8th vector gets a copy with a tiny rotation-free
    # perturbation (scale + epsilon on one coordinate keeps cosine ~1)
    planted = []
    for i, v in base:
        if i % 8 == 0:
            w = [x * 1.25 for x in v]
            w[0] += 1e-9
            planted.append((i + 10_000, w))
    rows = base + planted
    seeds = [(s, dict(base)[s]) for s in range(6)]
    emb = spark.createDataFrame(rows, SCHEMA)
    seed_df = spark.createDataFrame(
        [(sid, vec) for sid, vec in seeds],
        T.StructType(
            [
                T.StructField("seed_id", T.LongType()),
                T.StructField("seed_vec", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    return rows, seeds, emb, seed_df


def test_drop_set_matches_brute_force(spark, corpus):
    rows, seeds, emb, seed_df = corpus
    assign = {
        r["vec_id"]: r["cluster_id"]
        for r in assign_by_cosine(emb, seed_df).collect()
    }
    want = _brute_force_drops(rows, assign, 0.999)
    got = {
        r["vec_id"]: r["dup_of"]
        for r in semantic_dedup(emb, seed_df, 0.999).collect()
    }
    assert got == want
    # the planted copies are all found, resolved to their originals
    assert got == {i + 10_000: i for i, _ in rows if i % 8 == 0 and i < 10_000}


def test_copies_share_their_originals_cluster(spark, corpus):
    """The quantizer is cosine-based, so a scaled copy can never be
    separated from its original by the cluster prune — the property that
    makes cluster-confined pair generation safe for exact near-dups."""
    rows, _, emb, seed_df = corpus
    assign = {
        r["vec_id"]: r["cluster_id"]
        for r in assign_by_cosine(emb, seed_df).collect()
    }
    for i, _ in rows:
        if i >= 10_000:
            assert assign[i] == assign[i - 10_000]


def test_pair_join_is_cluster_keyed_no_cartesian(spark, corpus):
    """The intra-cluster pair join must be a KEYED join on cluster_id —
    the quantizer is the prune. The only nested-loop allowed is the
    broadcast of the K seed rows."""
    _, _, emb, seed_df = corpus
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        semantic_dedup(emb, seed_df, 0.999).explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    # the pair join itself is hash/sort-merge on cluster_id
    assert "cluster_id" in plan


def test_hot_cluster_skew_probe(spark):
    """Adversarial skew: ONE seed → every vector lands in one cluster and
    the pair join degenerates to all-pairs in a single cell (the known
    SemDeDup failure mode; at scale you add banded pre-filtering or more
    centroids). The answer must stay exact even there."""
    rows = _vectors(80, seed=23)
    rows += [(i + 10_000, [x * 2.0 for x in v]) for i, v in rows if i % 5 == 0]
    emb = spark.createDataFrame(rows, SCHEMA)
    one_seed = spark.createDataFrame(
        [(0, rows[0][1])],
        T.StructType(
            [
                T.StructField("seed_id", T.LongType()),
                T.StructField("seed_vec", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    assign = {
        r["vec_id"]: r["cluster_id"] for r in assign_by_cosine(emb, one_seed).collect()
    }
    assert set(assign.values()) == {0}  # everything in the hot cell
    want = _brute_force_drops(rows, assign, 0.999)
    got = {
        r["vec_id"]: r["dup_of"] for r in semantic_dedup(emb, one_seed, 0.999).collect()
    }
    assert got == want
    assert got  # the planted dups were found even in the degenerate cell


def test_survivors_are_the_complement(spark, corpus):
    rows, _, emb, seed_df = corpus
    dropped = {r["vec_id"] for r in semantic_dedup(emb, seed_df, 0.999).collect()}
    all_ids = {i for i, _ in rows}
    survivors = all_ids - dropped
    # every survivor has no smaller-id near-twin in its cluster: re-running
    # dedup on survivors alone drops nothing
    surviving_df = emb.filter(F.col("vec_id").isin([int(x) for x in survivors]))
    assert semantic_dedup(surviving_df, seed_df, 0.999).count() == 0


def test_two_level_super_tie_never_drops_rows(spark):
    """ADVICE r9 (medium): a super-seed whose cosine against a SMALLER-id
    super ROUNDS to 1.0 (6-dp) used to route away from itself on the
    tie-break, leaving its group empty — a query strictly nearest to it
    still routed there at level 1, found zero level-2 candidates, and
    silently vanished from the assignment output (downstream inner joins
    in IncrementalSemanticDeduper then neither flag nor append it: data
    loss). Pin: the forced identity routing keeps coverage total.

    Geometry (2-D embedded in DIM): super A at angle 0, super B at angle
    1e-4 (cos rounds to 1.000000 — a genuine rounded tie), query q at
    angle 1e-4 + 0.7 so round(cos(q,B),6) > round(cos(q,A),6) — q routes
    to B strictly. Pre-fix, B routed to A and q was dropped."""
    from tipoca_stream_spark.operators.semantic_dedup import (
        assign_by_cosine_two_level,
    )

    def at_angle(theta: float) -> list[float]:
        return [math.cos(theta), math.sin(theta)] + [0.0] * (DIM - 2)

    eps = 1e-4
    # k=4 seeds -> ceil(sqrt(4)) = 2 supers: ids 0 (A) and 1 (B)
    seeds = [
        (0, at_angle(0.0)),
        (1, at_angle(eps)),
        (2, at_angle(0.3)),  # routes to A-or-B; irrelevant
        (3, at_angle(1.2)),
    ]
    assert round(_cos(seeds[0][1], seeds[1][1]), 6) == 1.0  # the tie is real
    queries = [(100, at_angle(eps + 0.7)), (101, at_angle(-0.05)), (102, at_angle(1.1))]
    seed_df = spark.createDataFrame(
        seeds,
        T.StructType(
            [
                T.StructField("seed_id", T.LongType()),
                T.StructField("seed_vec", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    emb = spark.createDataFrame(queries, SCHEMA)
    got = {r["vec_id"]: r["cluster_id"] for r in
           assign_by_cosine_two_level(emb, seed_df).collect()}
    # coverage is total: every input id is assigned (the bug dropped 100)
    assert set(got) == {100, 101, 102}
    # and q=100's routed group contained its super: B self-routed, so the
    # group is {1 (forced), 2 (angle 0.3, nearer B than A)} — the level-2
    # argmax lands on 2, the group member nearest q
    assert got[100] in (1, 2)
