"""Semantic (embedding-space) deduplication — SemDeDup-style.

The lexical dedup family (operators/corpus_dedup.py: exact, MinHash-LSH,
n-gram Jaccard, SimHash, containment) catches documents that SHARE TEXT.
It cannot catch semantic duplicates — a paraphrase, a re-encode, a
translation round-trip — whose token overlap is low but whose embeddings
nearly coincide. Training-data pipelines run an embedding-space pass
beside the lexical ones (Abbas et al., "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication", arXiv:2303.09540):

1. **Coarse quantize**: assign every vector to a cluster. Here the
   quantizer is cosine-against-seed-vectors (``assign_by_cosine``): a
   broadcast of K seed embeddings, one narrow scan, argmax cosine with a
   deterministic 6-dp round + seed-id tie-break so any two engines agree
   on every assignment. Cosine assignment is SCALE-INVARIANT — a
   re-normalized or re-scaled copy of a vector provably lands in its
   original's cluster, so the cluster prune can never separate the exact
   near-dup pairs it exists to find. (k-means-trained centroids drop in
   unchanged — ``operators/kmeans.kmeans_train`` emits them — the seeds
   just make the assignment reproducible for the oracle.)
2. **Intra-cluster gate**: candidate pairs are generated ONLY within a
   cluster (join keyed on cluster_id — k clusters cut the pair count to
   ~n²/k; the plan shows a keyed join, never a cartesian product), then
   exact cosine ≥ threshold marks near-duplicates.
3. **Keep-one**: a vector is dropped iff some SMALLER-id vector in its
   cluster clears the threshold with it; the surviving set is exactly
   the ids with no smaller near-twin. Deterministic, order-free, and
   per-pair local — no connected-components pass, matching SemDeDup's
   keep-one-representative policy.

At 100 TB: the assignment is a broadcast + narrow map (no shuffle); the
pair join shuffles on cluster_id only. A pathologically hot cluster is
the known failure mode (same as any LSH bucket): cap it with the banded
candidate generation from operators/similarity.lsh_near_dup as a
pre-filter inside the cluster, or re-train centroids with more k — the
skew probe in tests/test_semantic_dedup.py measures the hot-cluster
case rather than assuming it away.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tipoca_stream_spark.operators.similarity import (
    _norm,
    cosine,
    cosine_prenormed,
)


def assign_by_cosine(
    emb: DataFrame,
    seeds: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_id_col: str = "seed_id",
    seed_vec_col: str = "seed_vec",
) -> DataFrame:
    """(id, cluster_id): nearest seed by cosine. Seeds are K rows —
    broadcast; the argmax is a map-side-combinable ``max(struct)`` (no
    window, no extra shuffle beyond the id-keyed aggregate). Cosine is
    rounded to 6 dp before the argmax and ties break toward the SMALLER
    seed id, so assignments are engine-reproducible (the DuckDB oracle
    recomputes them exactly)."""
    # norms hoisted out of the crossJoin (round 15, cosine_prenormed): the
    # row norm was re-folded once per seed and each seed's norm once per row
    scored = (
        emb.withColumn("_vn", _norm(F.col(vec_col)))
        .crossJoin(F.broadcast(seeds.withColumn("_sn", _norm(F.col(seed_vec_col)))))
        .select(
            F.col(id_col),
            F.col(seed_id_col),
            F.round(
                cosine_prenormed(
                    F.col(vec_col), F.col(seed_vec_col), F.col("_vn"), F.col("_sn")
                ),
                6,
            ).alias("_cs"),
        )
    )
    # lexicographic max over (similarity, -seed_id): highest cosine wins,
    # smaller seed id on rounded ties
    pick = F.max(
        F.struct(
            F.col("_cs"),
            (-F.col(seed_id_col)).alias("_neg"),
            F.col(seed_id_col).alias("_sid"),
        )
    )
    return scored.groupBy(id_col).agg(pick.getField("_sid").alias("cluster_id"))


def assign_by_cosine_two_level(
    emb: DataFrame,
    seeds: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_id_col: str = "seed_id",
    seed_vec_col: str = "seed_vec",
    n_super: int | None = None,
    n_seeds: int | None = None,
) -> DataFrame:
    """(id, cluster_id): TWO-LEVEL nearest-seed assignment — route to the
    nearest of ceil(√k) SUPER-seeds (the smallest-id prefix of the seed
    set), then argmax only over the seeds routed to that super-seed.

    Why it exists (round-9 probe, SCALE_PROBE_r09_assignment.json): the
    flat assignment is batch×k cosines, and the maintenance policy grows
    k ∝ corpus — measured 1.6 s/batch at k=1024 and 12 s at k=8192, so
    past k≈10³ the assignment term dominates the semantic screen. Two
    levels cut the work to ~batch×2√k (k=8192: ~180 cosines/vector
    instead of 8192, ~45× less).

    Semantics: deterministic at BOTH levels (rounded cosine, smaller-id
    ties), so any two engines agree on every assignment — and cosine's
    scale-invariance still guarantees a vector and its scaled copy land
    in the SAME cluster, the property cluster-confined dedup needs. The
    assignment may DIFFER from the flat argmax (a query can route to a
    super-seed whose group lacks the globally nearest seed) — the same
    contract as one-level quantization itself: the quantizer defines
    comparison neighborhoods, it never promises the global nearest.
    Every super-seed is FORCED to route to itself, so no group is empty
    and every query finds candidates — self-cosine is exactly 1.0, but
    another super's cosine can ROUND to 1.0 too (6-dp), and the
    smaller-id tie-break would then route the larger-id super away from
    itself, leaving a group that level-1 queries still route to but that
    yields zero level-2 candidates: those queries would vanish through
    the candidate inner join (silent data loss — ADVICE r9 medium). The
    identity override restores the no-empty-group guarantee
    structurally; the DuckDB oracle replays the same rule. A
    pathologically hot super-group is the familiar quantizer failure
    mode — the skew answer is more supers (n_super) or retrained seeds,
    as with flat clusters."""
    import math

    # n_seeds: caller-supplied exact seed count (round 15) — sizing the
    # super level needed a count() JOB per construction when the caller
    # already knows |seeds| (dense-id prefix filters). Wrong hints only
    # mis-size the super level (performance), never change assignments.
    k = n_seeds if n_seeds is not None else seeds.count()
    s = n_super or (math.isqrt(max(k - 1, 0)) + 1)  # ceil(sqrt(k)), k >= 1
    supers = (
        seeds.orderBy(seed_id_col)
        .limit(s)
        .select(
            F.col(seed_id_col).alias("super_id"),
            F.col(seed_vec_col).alias("super_vec"),
        )
    )
    # Defensive fan-out for the ROUTING stage (the two-level sibling of
    # _assigned's batch fan-out): the k × √k routing crossJoin inherits
    # the SEEDS' partitioning, and a persisted quantizer is typically ONE
    # parquet file (grown_seeds writes an orderBy().limit() plan) — the
    # assignment's dominant stage then runs k·√k HOF cosines in a single
    # task no matter how many cores exist. Found by the round-10 flip
    # soak: at k=7750 the fresh-JVM A/B read two_level ≈ flat (10.5 s vs
    # 10.6 s) with 1-file seeds while the same shapes with 32-file seeds
    # measured 4.0 s vs 12.6 s. Both routing references (the assignment
    # and the broadcast build of the routed groups) share this input.
    # unconditional: the old `if seeds.rdd.getNumPartitions() < p` guard
    # paid a full plan→RDD conversion (~0.15 s of physical planning) per
    # construction to MAYBE skip an exchange of k tiny rows (round 15,
    # guide §1.2); the always-on repartition of a k-row frame costs
    # milliseconds and keeps the k×√k routing crossJoin wide
    p = seeds.sparkSession.sparkContext.defaultParallelism
    seeds = seeds.repartition(p)
    # one-time seed routing: k × √k cosines. A super-seed's routed id is
    # OVERRIDDEN with its own id (see docstring: rounded ties could
    # otherwise route it to a smaller-id near-twin super, emptying its
    # group and silently dropping the queries that route there).
    routing = (
        assign_by_cosine(
            seeds, supers, id_col=seed_id_col, vec_col=seed_vec_col,
            seed_id_col="super_id", seed_vec_col="super_vec",
        )
        .withColumnRenamed("cluster_id", "super_id")
        .join(
            F.broadcast(supers.select(F.col("super_id").alias("_self_id"))),
            F.col(seed_id_col) == F.col("_self_id"),
            "left",
        )
        .select(
            F.col(seed_id_col),
            F.coalesce(F.col("_self_id"), F.col("super_id")).alias("super_id"),
        )
    )
    routed = seeds.join(routing, seed_id_col)
    # level 1: query → super (n × √k cosines)
    q_super = assign_by_cosine(
        emb, supers, id_col=id_col, vec_col=vec_col,
        seed_id_col="super_id", seed_vec_col="super_vec",
    ).withColumnRenamed("cluster_id", "super_id")
    # level 2: argmax within the routed group (n × ~k/√k cosines; the
    # group join is keyed on super_id and the seed side is broadcastable)
    # norms hoisted out of the group join (round 15, cosine_prenormed): a
    # query row meets ~k/√k routed seeds, a seed meets every routed query
    cand = (
        emb.select(id_col, vec_col)
        .withColumn("_vn", _norm(F.col(vec_col)))
        .join(q_super, id_col)
        .join(
            F.broadcast(
                routed.select("super_id", seed_id_col, seed_vec_col).withColumn(
                    "_sn", _norm(F.col(seed_vec_col))
                )
            ),
            "super_id",
        )
    )
    pick = F.max(
        F.struct(
            F.round(
                cosine_prenormed(
                    F.col(vec_col), F.col(seed_vec_col), F.col("_vn"), F.col("_sn")
                ),
                6,
            ).alias("_cs"),
            (-F.col(seed_id_col)).alias("_neg"),
            F.col(seed_id_col).alias("_sid"),
        )
    )
    return cand.groupBy(id_col).agg(pick.getField("_sid").alias("cluster_id"))


def salt_factor(df: DataFrame, n_clusters: int) -> int:
    """How many ways to split each cluster so the pair join can use every
    core: a join keyed on cluster_id alone has at most k distinct keys —
    with k=8 on 32 cores, 24 cores idle through the compute-bound cosine
    stage (measured 21× at 10× data BEFORE salting, scale probe r7).
    ceil(parallelism / k), so k ≥ cores needs no replication at all —
    which is also the k ∝ n deployment regime where the join is already
    wide."""
    p = df.sparkSession.sparkContext.defaultParallelism
    return max(1, -(-p // max(n_clusters, 1)))


def semantic_dedup(
    emb: DataFrame,
    seeds: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: int | None = None,
    assign: DataFrame | None = None,
    n_seeds: int | None = None,
) -> DataFrame:
    """Dropped rows ``(id, cluster_id, dup_of)``: every vector with a
    smaller-id neighbor at cosine ≥ threshold inside its cluster, with
    ``dup_of`` = the smallest such neighbor (the kept representative it
    duplicates). The keep set is the complement — survivors need no
    second pass. Cosines are rounded to 6 dp before the threshold so the
    gate is engine-reproducible.

    The pair join is salted ``(cluster_id, salt)``: the a-side takes one
    deterministic salt per row (pmod of its id hash), the b-side
    replicates to every salt value — each (a, b) pair meets exactly
    once, and a cluster's pair work spreads across ``salt`` tasks
    instead of one. ``salt=None`` picks ceil(cores / k); pass 1 to
    disable (k ∝ n deployments need no replication)."""
    # n_seeds: caller-supplied exact count (round 15) — it only feeds the
    # salt-factor parallelism decision, but computing it was a Spark job
    # per construction; a wrong hint changes the salt (plan shape), never
    # the result set (each pair still meets exactly once)
    n_clusters = n_seeds if n_seeds is not None else seeds.count()
    s = salt if salt is not None else salt_factor(emb, n_clusters)
    p = emb.sparkSession.sparkContext.defaultParallelism
    # assign= lets a caller swap the quantizer (e.g. the two-level
    # assignment above) while keeping the pair-join/gate machinery
    if assign is None:
        assign = assign_by_cosine(emb, seeds, id_col, vec_col)
    # Both pair sides consume the assigned frame. Round-8 measured the
    # materialization remedies at sf1 and REJECTED them: localCheckpoint
    # (lazy) pays ~8 s of eager physical planning (toRdd) per fresh
    # build — worse than the ~1.2 s double execution it saves — and
    # persist() without an unpersist point leaks CacheManager entries per
    # call. Round 15 instead derives BOTH sides from one explicitly
    # exchanged frame (`shared` below): the branches contain the
    # byte-identical Exchange subtree, so ReuseExchange executes the
    # assignment (n×k cosine crossJoin + argmax + join) ONCE and the
    # second branch reads the shuffle output — plan-level sharing with no
    # cache, no checkpoint, nothing persisted across actions (guide §2.4:
    # two operations keyed the same way share one exchange).
    sided = emb.select(F.col(id_col), F.col(vec_col)).join(assign, id_col)
    # the shared frame is explicitly hash-split on (cluster_id, _salt)
    # into a PINNED partition count: its input rows are few and AQE would
    # coalesce the post-shuffle side to one partition by byte size —
    # blind to the ~n²/k pair blowup the join pipelines into it (measured
    # 1-task 4-minute stages at sf1 before this; AQE never overrides a
    # user-specified numPartitions). The a-side salt (one deterministic
    # salt per row) is computed BEFORE the exchange so the a-side probe
    # needs no further shuffle; the b-side re-keys on its exploded salt.
    # the norm is hoisted into the exchanged frame (round 15,
    # cosine_prenormed): each vector participates in ~n/k pairs, and the
    # interpreted norm fold was re-run per pair on BOTH sides; one double
    # per row rides the exchange instead
    shared = sided.select(
        F.col("cluster_id"),
        F.pmod(F.hash(F.col(id_col)), F.lit(s)).alias("_salt"),
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        _norm(F.col(vec_col)).alias("_n"),
    ).repartition(p, F.col("cluster_id"), F.col("_salt"))
    a = shared.select(
        "cluster_id",
        "_salt",
        F.col("_id").alias("_a_id"),
        F.col("_vec").alias("_a_vec"),
        F.col("_n").alias("_a_n"),
    )
    b = shared.select(
        F.col("cluster_id"),
        F.explode(F.sequence(F.lit(0), F.lit(s - 1))).alias("_salt"),
        F.col("_id").alias("_b_id"),
        F.col("_vec").alias("_b_vec"),
        F.col("_n").alias("_b_n"),
    )
    # cluster-confined candidate pairs: the join key IS the cluster — the
    # quantizer is the prune (n²/k pairs), pinned in the plan test
    pairs = a.join(b, ["cluster_id", "_salt"]).filter(F.col("_a_id") < F.col("_b_id"))
    near = pairs.filter(
        F.round(
            cosine_prenormed(
                F.col("_a_vec"), F.col("_b_vec"), F.col("_a_n"), F.col("_b_n")
            ),
            6,
        )
        >= F.lit(threshold)
    )
    return near.groupBy(
        F.col("_b_id").alias(id_col), F.col("cluster_id")
    ).agg(F.min("_a_id").alias("dup_of"))
