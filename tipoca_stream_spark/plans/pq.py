"""Product quantization (PQ) for ANN: per-subspace vector codes and
asymmetric-distance (ADC) top-k search.

Completes the similarity family's scale ladder: brute cosine (exact
baseline) → LSH buckets / IVF cells (candidate confinement) → PQ (memory
compression: a 64-dim float vector becomes M=4 one-byte codes, so a
100 TB embedding corpus's search structure fits in a fraction of the
footprint, and query-time distance is M table lookups instead of a
64-dim dot product).

Same oracle discipline as the IVF family (plans/extended.py): the
codebooks are FIXED deterministic pseudo-random tables literal-embedded
in the DuckDB SQL, so both engines quantize identically and the driver's
value-hash gate checks the whole encode → LUT → ADC-rank pipeline
exactly. (Training the codebooks is the kmeans_lloyd_update operator run
per subspace — the Lloyd step is already oracle-checked; fixing the
codebooks here isolates the PQ data plane from float-iteration drift.)

Scale notes: encoding is one narrow JVM-side pass (slice + zip_with +
argmin chain — no UDFs, no shuffle); the ADC scan is codes ⨝ broadcast
1-row LUT, a map-only stage feeding TakeOrderedAndProject.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tipoca_stream_spark.plans.registry import query
from tipoca_stream_spark.plans.training import _embs

DIM = 64
M = 4  # subspaces
SUB = DIM // M  # dims per subspace
K = 8  # codes per subspace


def _codebooks(seed: int = 11) -> list[list[list[float]]]:
    """Deterministic codewords scaled to the DATA's subvector scale: the
    corpus embeddings are unit-norm, so an M-way subvector has norm
    ≈ √(SUB/DIM); raw gauss codewords (norm ≈ √SUB) made the nearest-
    codeword argmin collapse onto the smallest-norm codeword — subspace 0
    used ONE code for the whole corpus until round 8, so the graded PQ
    data plane (codes → ADC → recall) was quantizing with a constant.
    Each codeword is normalized to that subvector scale, making the
    codebook a direction split the data actually spreads over."""
    rng = random.Random(seed)
    scale = math.sqrt(SUB / DIM)
    cents = [
        [[rng.gauss(0.0, 1.0) for _ in range(SUB)] for _ in range(K)]
        for _ in range(M)
    ]
    return [
        [
            [x * scale / math.sqrt(sum(y * y for y in cw)) for x in cw]
            for cw in book
        ]
        for book in cents
    ]


CODEBOOKS = _codebooks()


def _argmin_case(prefix: str) -> str:
    whens = []
    for i in range(K):
        conds = [f"{prefix}{i} < {prefix}{j}" for j in range(i)] + [
            f"{prefix}{i} <= {prefix}{j}" for j in range(i + 1, K)
        ]
        whens.append(f"WHEN {' AND '.join(conds)} THEN {i}")
    return "CASE " + " ".join(whens) + " ELSE 0 END"


def _sub_ctes(m: int, source_filter: str = "") -> list[str]:
    """CTE pair computing d0..d{K-1} (squared L2 to each code word) for
    subspace ``m`` — parallel-unnest of the slice against the literal
    codebook rows, the _CENTROID_UNNESTS pattern from the IVF oracle."""
    lo, hi = m * SUB + 1, (m + 1) * SUB
    unnests = ",\n         ".join(
        "unnest([" + ", ".join(repr(x) for x in CODEBOOKS[m][k_]) + f"]) AS c{k_}"
        for k_ in range(K)
    )
    d2 = ", ".join(f"sum((x - c{k_}) * (x - c{k_})) AS d{k_}" for k_ in range(K))
    return [
        f"expl{m} AS (SELECT vec_id, unnest(embedding[{lo}:{hi}])::double AS x,\n"
        f"         {unnests}\n  FROM embeddings{source_filter})",
        f"dist{m} AS (SELECT vec_id, {d2} FROM expl{m} GROUP BY vec_id)",
        f"code{m} AS (SELECT vec_id, ({_argmin_case('d')}) AS code FROM dist{m})",
    ]


PQ_CODES_SQL = (
    "WITH "
    + ",\n".join(cte for m in range(M) for cte in _sub_ctes(m))
    + "\nSELECT c0.vec_id, "
    + ", ".join(f"c{m}.code AS code_{m}" for m in range(M))
    + "\nFROM code0 c0 "
    + " ".join(f"JOIN code{m} c{m} ON c{m}.vec_id = c0.vec_id" for m in range(1, M))
)


def _sub_dists(m: int):
    """Spark column d0..d{K-1}: squared L2 of the m-th slice to each code."""
    sub = F.slice(F.col("embedding"), m * SUB + 1, SUB)
    return [
        F.aggregate(
            F.zip_with(
                sub,
                F.array(*[F.lit(x) for x in CODEBOOKS[m][k_]]),
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias(f"m{m}d{k_}")
        for k_ in range(K)
    ]


def _argmin_col(names: list[str]):
    best = F.lit(0)
    best_d = F.col(names[0])
    for i in range(1, len(names)):
        cond = F.col(names[i]) < best_d
        best = F.when(cond, F.lit(i)).otherwise(best)
        best_d = F.when(cond, F.col(names[i])).otherwise(best_d)
    return best.cast("int")


def pq_encode(emb: DataFrame) -> DataFrame:
    """(vec_id, code_0..code_{M-1}): per-subspace nearest code word.

    One narrow projection — all M argmins evaluate in the same
    whole-stage-codegen'd map stage; nothing shuffles."""
    dist_cols = [d for m in range(M) for d in _sub_dists(m)]
    wide = emb.select("vec_id", *dist_cols)
    return wide.select(
        "vec_id",
        *[
            _argmin_col([f"m{m}d{k_}" for k_ in range(K)]).alias(f"code_{m}")
            for m in range(M)
        ],
    )


@query("similarity_pq_codes", PQ_CODES_SQL, survey_ref="training: ANN PQ encoder")
def similarity_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    # load_table directly (not _embs' fan-out repartition): encoding is a
    # pure projection, so parallelism should come from the input splits —
    # zero Exchange at any scale (pinned in test_plan_shapes.py)
    from tipoca_stream_spark.sources.tables import load_table

    return pq_encode(load_table(spark, sf_dir, "embeddings"))


def _adc_parts() -> tuple[list[str], str, str]:
    """(CTE list, summed-distance expr, pm-join chain) for the ADC score
    of every corpus vector — shared by the plain ADC oracle and the
    IVF+PQ composition."""
    ctes = [cte for m in range(M) for cte in _sub_ctes(m)]
    # query-side LUT: the same per-subspace distances, restricted to vec 0
    for m in range(M):
        ctes.append(
            f"qlut{m} AS (SELECT {', '.join(f'd{k_}' for k_ in range(K))}"
            f" FROM dist{m} WHERE vec_id = 0)"
        )
        case = (
            "CASE c.code "
            + " ".join(f"WHEN {k_} THEN q.d{k_}" for k_ in range(K))
            + " END"
        )
        ctes.append(
            f"pm{m} AS (SELECT c.vec_id, {case} AS dm"
            f" FROM code{m} c CROSS JOIN qlut{m} q)"
        )
    total = " + ".join(f"p{m}.dm" for m in range(M))
    joins = " ".join(f"JOIN pm{m} p{m} ON p{m}.vec_id = p0.vec_id" for m in range(1, M))
    return ctes, total, joins


def _adc_sql() -> str:
    ctes, total, joins = _adc_parts()
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT p0.vec_id, round({total}, 6) AS adc_d2"
        + f"\nFROM pm0 p0 {joins}"
        + "\nWHERE p0.vec_id <> 0"
        + "\nORDER BY round(" + total + ", 6), p0.vec_id LIMIT 10"
    )


def _adc_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unlimited (vec_id, adc_d2) frame over all corpus vectors — the
    shared Spark half of the ADC oracle parts above."""
    emb = _embs(spark, sf_dir)
    codes = pq_encode(emb)
    qlut = emb.filter(F.col("vec_id") == 0).select(
        *[d for m in range(M) for d in _sub_dists(m)]
    )
    adc = codes.crossJoin(F.broadcast(qlut))
    dist = None
    for m in range(M):
        lut = F.array(*[F.col(f"m{m}d{k_}") for k_ in range(K)])
        dm = F.element_at(lut, F.col(f"code_{m}") + 1)
        dist = dm if dist is None else dist + dm
    return adc.where(F.col("vec_id") != 0).select(
        "vec_id", F.round(dist, 6).alias("adc_d2")
    )


@query(
    "similarity_pq_adc_topk",
    _adc_sql(),
    survey_ref="training: ANN PQ asymmetric-distance search",
)
def similarity_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC search: the query vector's squared distance to every code word
    of every subspace (an M x K lookup table, one broadcast row) replaces
    the full-dim distance — each corpus vector costs M lookups + adds on
    its CODES, never touching the original floats. The scan side reads
    only the code columns; ranking is TakeOrderedAndProject. At 100 TB
    the codes table is ~1/64 the corpus bytes, and this plan never
    shuffles anything wider than (vec_id, 4 ints)."""
    return _adc_scored(spark, sf_dir).orderBy("adc_d2", "vec_id").limit(10)


def _exact_l2_cte() -> str:
    return """
    q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    l2expl AS (SELECT e.vec_id, unnest(e.embedding)::double AS a,
                      unnest(q.qe)::double AS b
               FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0),
    l2 AS (SELECT vec_id, sum((a - b) * (a - b)) AS d
           FROM l2expl GROUP BY vec_id),
    exact10 AS (SELECT vec_id FROM l2 ORDER BY round(d, 6), vec_id LIMIT 10)
    """


@query(
    "similarity_pq_recall",
    "WITH "
    + _exact_l2_cte().strip()
    + f""",
    pq10 AS (SELECT vec_id FROM ({_adc_sql()}))
    SELECT count(*)::bigint AS n_overlap,
           round(count(*) / 10.0, 3) AS recall_at_10
    FROM exact10 JOIN pq10 USING (vec_id)
    """,
    survey_ref="training: ANN quality evaluation (recall@k of PQ-ADC vs exact L2)",
)
def similarity_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the ADC code-table ranking against the exact L2
    top-10 — quantifies what the 64-to-4-byte compression costs in
    ranking fidelity (the number an IVF+PQ deployment tunes M/K
    against). Composes the registered ADC builder with an inline exact
    L2 side; both engines recompute both paths."""
    from tipoca_stream_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("_q"))
    d2 = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("_q"),
            lambda a, b: (a.cast("double") - b.cast("double"))
            * (a.cast("double") - b.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    exact10 = (
        emb.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != 0)
        .select("vec_id", F.round(d2, 6).alias("d"))
        .orderBy("d", "vec_id")
        .limit(10)
        .select("vec_id")
    )
    pq10 = similarity_pq_adc_topk(spark, sf_dir).select("vec_id")
    return exact10.join(pq10, "vec_id").agg(
        F.count("*").cast("bigint").alias("n_overlap"),
        F.round(F.count("*") / 10.0, 3).alias("recall_at_10"),
    )


def _ivfpq_sql() -> str:
    from tipoca_stream_spark.plans.extended import IVF_ASSIGN_SQL

    ctes, total, joins = _adc_parts()
    return (
        f"WITH assign AS ({IVF_ASSIGN_SQL}),\n"
        + "qcell AS (SELECT centroid_id FROM assign WHERE vec_id = 0),\n"
        + ",\n".join(ctes)
        + f",\nadc AS (SELECT p0.vec_id, round({total}, 6) AS adc_d2"
        + f" FROM pm0 p0 {joins} WHERE p0.vec_id <> 0)\n"
        + "SELECT adc.vec_id, adc.adc_d2 FROM adc\n"
        + "JOIN assign a ON a.vec_id = adc.vec_id\n"
        + "JOIN qcell ON a.centroid_id = qcell.centroid_id\n"
        + "ORDER BY adc.adc_d2, adc.vec_id LIMIT 10"
    )


@query(
    "similarity_ivfpq_topk",
    _ivfpq_sql(),
    survey_ref="training: ANN IVF+PQ (cell-confined ADC, the FAISS-style pipeline)",
)
def similarity_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The combined index large ANN deployments actually run: the IVF
    coarse quantizer confines candidates to the query's cell (the scan
    touches ~1/n_cells of the corpus), and PQ's ADC table ranks inside
    it (each candidate costs M lookups on its 4-byte code, never a
    64-float distance). At 100 TB: cell id is the partition key, codes
    are the payload — one partition of a table 1/64th the corpus bytes.
    Composes the registered IVF assignment and the shared ADC scorer;
    the oracle composes their SQL the same way."""
    from tipoca_stream_spark.plans.extended import ivf_assign

    emb = _embs(spark, sf_dir)
    assign = ivf_assign(emb).persist()  # reused by query-cell + candidate sides
    qcell = assign.where(F.col("vec_id") == 0).select(
        F.col("centroid_id").alias("_qc")
    )
    cands = (
        assign.join(F.broadcast(qcell), F.col("centroid_id") == F.col("_qc"))
        .where(F.col("vec_id") != 0)
        .select("vec_id")
    )
    # confine BEFORE scoring: only the query cell's codes get LUT-scored
    # (the 1/n_cells claim holds in the physical plan, not just the join
    # order) — semi-join the codes down, then score
    codes = pq_encode(emb).join(cands, "vec_id", "left_semi")
    qlut = emb.filter(F.col("vec_id") == 0).select(
        *[d for m in range(M) for d in _sub_dists(m)]
    )
    adc = codes.crossJoin(F.broadcast(qlut))
    dist = None
    for m in range(M):
        lut = F.array(*[F.col(f"m{m}d{k_}") for k_ in range(K)])
        dm = F.element_at(lut, F.col(f"code_{m}") + 1)
        dist = dm if dist is None else dist + dm
    return (
        adc.select("vec_id", F.round(dist, 6).alias("adc_d2"))
        .orderBy("adc_d2", "vec_id")
        .limit(10)
    )
