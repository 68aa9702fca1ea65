"""Extended query surface (SURVEY.md §2.5-2.9 breadth): pivot, grouping
sets, rank-family windows, exact-formula statistics, subqueries, and the
IVF flavor of ANN search. Every aggregate that would be float-order
sensitive is computed from decimal-exact sums so the DuckDB oracle matches
bit-for-bit."""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tipoca_stream_spark.operators import similarity as sim
from tipoca_stream_spark.operators.exprcache import memo_expr
from tipoca_stream_spark.plans.registry import query
from tipoca_stream_spark.plans.training import _COSINE_CTE as _COSINE_CTE_REF, _embs
from tipoca_stream_spark.sources.tables import load_table


@query(
    "pivot_qty_by_status",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS O,
           CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS F
    FROM lineitem GROUP BY l_returnflag
    """,
    survey_ref="§2.5 pivot",
)
def pivot_qty_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double"))
    )


@query(
    "window_rank_suite",
    """
    SELECT c_custkey,
           c_mktsegment,
           dense_rank() OVER w AS drank,
           rank() OVER w AS rnk,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS prank
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
    survey_ref="§2.7 rank family",
)
def window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.dense_rank().over(w).alias("drank"),
        F.rank().over(w).alias("rnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
    )


@query(
    "agg_stats_exact",
    """
    WITH s AS (
      SELECT o_orderstatus,
             count(*) AS n,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)::DECIMAL(20,0)) AS sx,
             sum((CAST(round(o_totalprice * 100) AS BIGINT) * CAST(round(o_totalprice * 100) AS BIGINT))::DECIMAL(38,0)) AS sxx,
             CAST(min(o_totalprice) AS DOUBLE) AS min_price,
             CAST(max(o_totalprice) AS DOUBLE) AS max_price
      FROM orders GROUP BY o_orderstatus)
    SELECT o_orderstatus, n, min_price, max_price,
           round(CAST(sx AS DOUBLE) / n / 100, 6) AS mean_price,
           round((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1) / 10000, 4) AS var_price
    FROM s
    """,
    survey_ref="§2.5 statistics",
)
def agg_stats_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean/variance from exact integer-cent moments: one distributed pass
    over overflow-safe decimal sums, unlike stddev()/var_samp() whose float
    merge order differs per engine (and unlike raw decimal×decimal, which
    DuckDB refuses to widen past its physical int64 lanes)."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    s = orders.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.sum(cents.cast("decimal(20,0)")).alias("sx"),
        F.sum((cents * cents).cast("decimal(38,0)")).alias("sxx"),
        F.min("o_totalprice").cast("double").alias("min_price"),
        F.max("o_totalprice").cast("double").alias("max_price"),
    )
    n, sx, sxx = F.col("n"), F.col("sx").cast("double"), F.col("sxx").cast("double")
    return s.select(
        "o_orderstatus",
        "n",
        "min_price",
        "max_price",
        F.round(sx / n / 100, 6).alias("mean_price"),
        # try_divide: a single-row group has n-1 = 0; DuckDB's double
        # division by zero yields NULL, ANSI Spark raises — NULL matches
        F.round(
            F.try_divide(sxx - sx * sx / n, n - 1) / 10000, 4
        ).alias("var_price"),
    )


@query(
    "topk_unshipped_revenue",
    """
    SELECT o.o_orderkey, strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(14,2)) * CAST(1 - l.l_discount AS DECIMAL(14,2))) AS DOUBLE) AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey LIMIT 10
    """,
    survey_ref="§2.6 multi-join, W4 top-k (TPC-H Q3 shape)",
)
def topk_unshipped_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(14,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(14,2)")
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("o_orderdate"),
            "revenue",
        )
    )


@query(
    "subquery_scalar_above_avg",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 1.8 * (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                                     / count(*) FROM orders)
    """,
    survey_ref="§2.6 scalar subquery",
)
def subquery_scalar_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # {df} binding: invocation-unique view, both references share one scan
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM {orders}
        WHERE o_totalprice > 1.8 * (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                                         / count(*) FROM {orders})
        """,
        orders=load_table(spark, sf_dir, "orders"),
    )


# --- IVF-style ANN: literal centroids → assign → search within cell ---------

N_CENTROIDS = 8


def _centroids(dim: int = 64, k: int = N_CENTROIDS, seed: int = 7) -> list[list[float]]:
    """Random UNIT-NORM directions. The corpus embeddings are unit-norm;
    raw gauss vectors have norm ~√dim ≈ 8, which puts every data vector
    in the same cell (d² ≈ 1 + |c|² − 2⟨v,c⟩ is dominated by |c|², so the
    smallest-norm centroid wins globally) — the IVF partition the graded
    queries exercised was ONE cell until round 8. Normalizing makes the
    cells a real Voronoi split of the sphere by direction."""
    rng = random.Random(seed)
    cents = [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(k)]
    return [[x / math.sqrt(sum(y * y for y in c)) for x in c] for c in cents]


CENTROIDS = _centroids()

_CENTROID_UNNESTS = ",\n       ".join(
    "unnest([" + ", ".join(repr(x) for x in c) + "]) AS c{i}".format(i=i)
    for i, c in enumerate(CENTROIDS)
)
_CENTROID_D2 = ", ".join(f"sum((x - c{i}) * (x - c{i})) AS d{i}" for i in range(N_CENTROIDS))
def _argmin_case() -> str:
    whens = []
    for i in range(N_CENTROIDS):
        conds = [f"d{i} < d{j}" for j in range(i)] + [
            f"d{i} <= d{j}" for j in range(i + 1, N_CENTROIDS)
        ]
        whens.append(f"WHEN {' AND '.join(conds)} THEN {i}")
    return "CASE " + " ".join(whens) + " ELSE 0 END"


_ARGMIN = _argmin_case()

IVF_ASSIGN_SQL = f"""
WITH expl AS (
  SELECT vec_id, unnest(embedding)::double AS x,
   {_CENTROID_UNNESTS}
  FROM embeddings),
dists AS (SELECT vec_id, {_CENTROID_D2} FROM expl GROUP BY vec_id)
SELECT vec_id, ({_ARGMIN}) AS centroid_id FROM dists
"""


def _centroid_d2_cols() -> list:
    """Per-centroid squared-L2 distance columns over ``embedding`` —
    memoized (round 14): N_CENTROIDS·64 literal leaves cost ~0.5 s of py4j
    round trips to rebuild per construction."""
    return memo_expr(
        ("ivf_centroid_d2", "embedding", tuple(tuple(c) for c in CENTROIDS)),
        lambda: [
            F.aggregate(
                F.zip_with(
                    F.col("embedding"),
                    F.array(*[F.lit(x) for x in c]),
                    lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias(f"d{i}")
            for i, c in enumerate(CENTROIDS)
        ],
    )


def ivf_assign(emb: DataFrame) -> DataFrame:
    """Assign each vector to its nearest (L2) centroid — the IVF coarse
    quantizer. One narrow pass; at scale this is the partitioning key that
    confines search to one cell."""
    with_d = emb.select("vec_id", *_centroid_d2_cols())

    def build_best():
        best = F.lit(0)
        best_d = F.col("d0")
        for i in range(1, N_CENTROIDS):
            cond = F.col(f"d{i}") < best_d
            best = F.when(cond, F.lit(i)).otherwise(best)
            best_d = F.when(cond, F.col(f"d{i}")).otherwise(best_d)
        return best.cast("int")

    best = memo_expr(("ivf_argmin", N_CENTROIDS), build_best)
    return with_d.select("vec_id", best.alias("centroid_id"))


@query("similarity_ivf_assign", IVF_ASSIGN_SQL, survey_ref="training: ANN IVF quantizer")
def similarity_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ivf_assign(_embs(spark, sf_dir))


@query(
    "similarity_ivf_topk",
    f"""
    WITH assign AS ({IVF_ASSIGN_SQL}),
    q AS (SELECT e.embedding AS qe, a.centroid_id AS qc
          FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id WHERE e.vec_id = 0),
    cand AS (SELECT e.vec_id, e.embedding FROM embeddings e
             JOIN assign a ON e.vec_id = a.vec_id JOIN q ON a.centroid_id = q.qc
             WHERE e.vec_id <> 0),
    expl AS (SELECT c.vec_id, unnest(c.embedding)::double AS x, unnest(q.qe)::double AS y
             FROM cand c CROSS JOIN q),
    sims AS (SELECT vec_id, sum(x*y)/(sqrt(sum(x*x))*sqrt(sum(y*y))) AS s
             FROM expl GROUP BY vec_id)
    SELECT vec_id, round(s, 6) AS sim FROM sims ORDER BY round(s, 6) DESC, vec_id LIMIT 10
    """,
    survey_ref="training: ANN IVF search",
)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search: restrict candidates to the query's centroid cell, exact
    re-rank inside. The cell join shuffles only (vec_id, centroid_id)."""
    emb = _embs(spark, sf_dir)
    assign = ivf_assign(emb).persist()  # reused by query + candidate sides
    q = (
        emb.filter(F.col("vec_id") == 0)
        .join(assign, "vec_id")
        .select(
            F.col("embedding").alias("_q"),
            F.col("centroid_id").alias("_qc"),
            sim._norm(F.col("embedding")).alias("_qn"),
        )
    )
    cands = (
        emb.join(assign, "vec_id")
        .join(F.broadcast(q), F.col("centroid_id") == F.col("_qc"))
        .filter(F.col("vec_id") != 0)
    )
    return (
        cands.select(
            "vec_id",
            F.round(
                sim.cosine_prenormed(
                    F.col("embedding"), F.col("_q"),
                    sim._norm(F.col("embedding")), F.col("_qn"),
                ),
                6,
            ).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col("vec_id"))
        .limit(10)
    )


NPROBE = 2

_QD_UNION = "\nUNION ALL\n".join(
    f"SELECT {i} AS cid, d{i} AS d FROM qd" for i in range(N_CENTROIDS)
)


@query(
    "similarity_ivf_topk_nprobe",
    f"""
    WITH assign AS ({IVF_ASSIGN_SQL}),
    qexpl AS (
      SELECT vec_id, unnest(embedding)::double AS x,
       {_CENTROID_UNNESTS}
      FROM embeddings WHERE vec_id = 0),
    qd AS (SELECT vec_id, {_CENTROID_D2} FROM qexpl GROUP BY vec_id),
    probes AS (SELECT cid FROM ({_QD_UNION}) ORDER BY d, cid LIMIT {{nprobe}}),
    q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    cand AS (SELECT e.vec_id, e.embedding FROM embeddings e
             JOIN assign a ON e.vec_id = a.vec_id
             JOIN probes p ON a.centroid_id = p.cid
             WHERE e.vec_id <> 0),
    expl AS (SELECT c.vec_id, unnest(c.embedding)::double AS x, unnest(q.qe)::double AS y
             FROM cand c CROSS JOIN q),
    sims AS (SELECT vec_id, sum(x*y)/(sqrt(sum(x*x))*sqrt(sum(y*y))) AS s
             FROM expl GROUP BY vec_id)
    SELECT vec_id, round(s, 6) AS sim FROM sims ORDER BY round(s, 6) DESC, vec_id LIMIT 10
    """.format(nprobe=NPROBE),
    survey_ref="training: ANN IVF multi-probe",
)
def similarity_ivf_topk_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF search: candidates come from the NPROBE centroid
    cells nearest to the QUERY VECTOR (not just its own cell) — the
    standard recall/latency knob. The probe list is nprobe rows (broadcast);
    the candidate join still shuffles only (vec_id, centroid_id)."""
    emb = _embs(spark, sf_dir)
    assign = ivf_assign(emb).persist()
    qvec = emb.filter(F.col("vec_id") == 0)
    probes = (
        qvec.select(*_centroid_d2_cols())
        .select(F.posexplode(F.array(*[F.col(f"d{i}") for i in range(N_CENTROIDS)])).alias("cid", "d"))
        .orderBy("d", "cid")
        .limit(NPROBE)
        .select("cid")
    )
    q = qvec.select(
        F.col("embedding").alias("_q"), sim._norm(F.col("embedding")).alias("_qn")
    )
    cands = (
        emb.join(assign, "vec_id")
        .join(F.broadcast(probes), F.col("centroid_id") == F.col("cid"))
        .filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
    )
    return (
        cands.select(
            "vec_id",
            F.round(
                sim.cosine_prenormed(
                    F.col("embedding"), F.col("_q"),
                    sim._norm(F.col("embedding")), F.col("_qn"),
                ),
                6,
            ).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col("vec_id"))
        .limit(10)
    )


@query(
    "kmeans_lloyd_update",
    f"""
    WITH assign AS ({IVF_ASSIGN_SQL}),
    expl AS (
      SELECT a.centroid_id, t.i AS pos, e.embedding[t.i]::double AS x
      FROM embeddings e JOIN assign a USING (vec_id),
           unnest(range(1, len(e.embedding) + 1)) AS t(i))
    SELECT centroid_id, pos, round(avg(x), 5) AS c
    FROM expl GROUP BY centroid_id, pos
    """,
    survey_ref="training: k-means Lloyd step (IVF centroid training)",
)
def kmeans_lloyd_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact Lloyd update from the fixed IVF centroids, in long form
    (centroid, dimension, new coordinate) so the oracle can compare it.
    The iterative trainer (``operators.kmeans.kmeans_train``) runs this
    same step with driver-held centroids; per-dimension means round to 5
    places because the two engines sum floats in different orders."""
    from tipoca_stream_spark.operators.kmeans import assign_to_centroids

    emb = _embs(spark, sf_dir)
    assigned = assign_to_centroids(emb, CENTROIDS)
    return (
        assigned.select("centroid_id", F.posexplode("embedding").alias("pos0", "x"))
        .groupBy("centroid_id", (F.col("pos0") + 1).alias("pos"))
        .agg(F.round(F.avg(F.col("x").cast("double")), 5).alias("c"))
    )


@query(
    "agg_approx_distinct",
    """
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           (abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
              <= 0.05 * count(DISTINCT l_partkey)) AS approx_within_5pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
    survey_ref="A3 approx_count_distinct",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct surface. The raw HLL estimate is
    engine-specific (Spark and DuckDB sketch differently), so the
    oracle-checkable contract is the one both engines share: the estimate
    lands within a 5% envelope of the exact count. Spark's default rsd is
    0.05 (~5% standard error — the envelope would be only ~1 sigma), so we
    pass rsd=0.01 explicitly: the 5% envelope is then ~5 sigma on the Spark
    side, and DuckDB's HLL (~1.6% error) already fits. Exact count + the
    within-envelope flag hash-match; the estimate itself stays internal."""
    li = load_table(spark, sf_dir, "lineitem")
    approx = F.approx_count_distinct("l_partkey", rsd=0.01)
    exact = F.countDistinct("l_partkey")
    return li.groupBy("l_returnflag").agg(
        exact.alias("exact_parts"),
        (F.abs(approx - exact) <= 0.05 * exact).alias("approx_within_5pct"),
    )


@query(
    "storage_zone_range_read",
    """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE ts BETWEEN (SELECT min(ts) + INTERVAL 1 HOUR FROM events)
                 AND (SELECT min(ts) + INTERVAL 3 HOUR FROM events)
    """,
    survey_ref="W2 sortkey/zone maps: range read off the versioned CDC target",
)
def storage_zone_range_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range read served through the zone-mapped bucketed CDC target
    (sources/target.py, round 5): events land in a catalog-bucketed,
    (bucket, ts)-range-laid-out versioned table whose per-file min/max
    stats prune the scan to overlapping files — Redshift's DISTKEY +
    SORTKEY block skipping (the reference declares SORTKEY on every
    target, sources/jdbc.py D1) on an immutable-file store. The oracle is
    a plain filtered scan: file skipping must never change the answer,
    only the scheduling (pruning is pinned in tests/test_target_zones.py;
    this query gates the ANSWER through the pruned path)."""
    import datetime
    import hashlib
    import os
    import tempfile

    from tipoca_stream_spark.sources.target import BucketedTargetTable

    ev = load_table(spark, sf_dir, "events")
    # per-(sf, process) build dir: idempotent within a process, never
    # stale across processes; the build is setup, the range read is the op
    tag = hashlib.sha1(f"{sf_dir}:{os.getpid()}".encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"zone_target_{tag}")
    t = BucketedTargetTable(
        spark, root, "events_zoned", buckets=8, keys=["user_id"],
        zone_cols=["ts"], zone_split=4,
    )
    if not t.exists():
        t.write(ev)
    lo = ev.agg(F.min("ts")).collect()[0][0]
    if lo is None:  # empty table: no range to read (BETWEEN NULL matches nothing)
        return t.read().select(
            "event_id", "user_id", "event_type", "value"
        ).filter(F.lit(False))
    return t.read_range(
        lo + datetime.timedelta(hours=1), lo + datetime.timedelta(hours=3)
    ).select("event_id", "user_id", "event_type", "value")


@query(
    "storage_zorder_box_read",
    """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE user_id BETWEEN 5 AND 20 AND value BETWEEN 10 AND 40
    """,
    survey_ref="W2 compound sortkey: Z-order layout, multi-column skipping",
)
def storage_zorder_box_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rectangle read (user_id range AND value range) served through a
    Z-ordered layout (sources/zorder.py): Morton-curve clustering on the
    quantized (user_id, value) pair makes every file a small 2-d
    hyper-rectangle, so the per-file min/max stats prune on BOTH columns —
    the lakehouse answer to the reference's compound SORTKEY, whose zones
    skip poorly on the second key alone. The oracle is a plain filtered
    scan: the curve changes scheduling, never the answer (two-dim pruning
    is pinned in tests/test_zorder.py)."""
    import hashlib
    import os
    import tempfile

    from tipoca_stream_spark.sources.zorder import ZOrderedTable

    ev = load_table(spark, sf_dir, "events")
    tag = hashlib.sha1(f"{sf_dir}:{os.getpid()}:zorder".encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"zorder_{tag}")
    t = ZOrderedTable(spark, root, cols=["user_id", "value"])
    marker = os.path.join(root, "_SUCCESS")
    if not os.path.exists(marker):
        t.write(ev, n_files=16)
    return t.read_box({"user_id": (5, 20), "value": (10.0, 40.0)}).select(
        "event_id", "user_id", "event_type", "value"
    )


@query(
    "storage_bloom_point_read",
    """
    SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
    FROM lineitem
    WHERE l_orderkey = (SELECT max(l_orderkey) FROM lineitem)
    """,
    survey_ref="W2 point-lookup skipping: per-file Bloom sidecar",
)
def storage_bloom_point_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PK point lookup served through a Bloom-indexed table
    (sources/bloomindex.py): lineitem laid out by ship date (the range
    access path), per-file Bloom words on l_orderkey built with one
    explode + bit_or pass. The probe prunes to the files whose filter
    covers all k probe bits — zone maps can't serve this (every file's
    orderkey range spans the probe); the residual equality filter keeps
    correctness independent of the index. Oracle = plain filtered scan;
    pruning itself is pinned in tests/test_bloomindex.py."""
    import hashlib
    import os
    import tempfile

    from tipoca_stream_spark.sources.bloomindex import BloomIndexedTable

    li = load_table(spark, sf_dir, "lineitem")
    tag = hashlib.sha1(f"{sf_dir}:{os.getpid()}".encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"bloom_li_{tag}")
    t = BloomIndexedTable(
        spark, root, key_col="l_orderkey", layout_col="l_shipdate",
        m_bits=1 << 16, k=5,
    )
    if not os.path.exists(os.path.join(root, "_bloom")):
        t.write(li, n_files=16)
    key = li.agg(F.max("l_orderkey")).collect()[0][0]
    return t.read_point(key).select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity"
    )


@query(
    "storage_dv_read",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
    FROM lineitem
    WHERE NOT coalesce(l_returnflag = 'R', false)
      AND NOT coalesce(l_linestatus = 'F' AND l_quantity > 45, false)
    GROUP BY l_returnflag, l_linestatus
    """,
    survey_ref="M4-family retroactive deletes: merge-on-read deletion vectors",
)
def storage_dv_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over a table carrying TWO accumulated deletion-vector
    batches (sources/deletevec.py): returns deleted via a retention-style
    sweep, then a second predicate delete — each one scan emitting
    (file, row_index) hits, no data rewrite; the read anti-joins the
    broadcast vector. The oracle is the equivalent NOT-filtered scan:
    merge-on-read must be answer-identical to copy-on-write."""
    import hashlib
    import os
    import tempfile

    from tipoca_stream_spark.sources.deletevec import DeletionVectorTable

    li = load_table(spark, sf_dir, "lineitem")
    tag = hashlib.sha1(f"{sf_dir}:{os.getpid()}".encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"dv_li_{tag}")
    t = DeletionVectorTable(spark, root)
    # build-complete sentinel = the LAST committed artifact (vector v2),
    # not the root dir (which the first write step already creates): a
    # crash mid-build can never leave a "complete" half-built table
    if t._current_version() != 2:
        t.write(li, n_files=8)
        t.delete_where(F.col("l_returnflag") == "R")
        t.delete_where((F.col("l_linestatus") == "F") & (F.col("l_quantity") > 45))
    return t.read().groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("l_quantity") * 100).cast("bigint"))
        .cast("bigint")
        .alias("qty_cents"),
    )


@query(
    "storage_bucketed_delete_where",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
    FROM lineitem
    WHERE NOT coalesce(l_returnflag = 'R', false)
      AND NOT coalesce(l_linestatus = 'F' AND l_quantity > 45, false)
    GROUP BY l_returnflag, l_linestatus
    """,
    survey_ref="M4-family retroactive deletes: copy-on-write bucket rewrite",
)
def storage_bucketed_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COPY-ON-WRITE dual of storage_dv_read (round 7), same oracle:
    the same two retroactive delete batches, but executed as
    ``BucketedTargetTable.delete_where`` — each delete finds the buckets
    holding matching rows and rewrites ONLY their survivors through the
    normal bucket-delta commit (untouched buckets hard-link; zone/bloom/
    posting sidecars refresh for touched buckets only; CAS flip). The
    two delete paths must agree exactly with the NOT-filtered oracle —
    merge-on-read and copy-on-write are cost models, never answers."""
    import hashlib
    import os
    import tempfile

    from tipoca_stream_spark.sources.target import BucketedTargetTable

    li = load_table(spark, sf_dir, "lineitem")
    tag = hashlib.sha1(f"{sf_dir}:{os.getpid()}:bdel".encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"bdel_li_{tag}")
    t = BucketedTargetTable(
        spark, root, "lineitem_bdel", buckets=8, keys=["l_orderkey"]
    )
    # sentinel = the LAST commit (v3 after write + two deletes): a crash
    # mid-build can never leave a "complete" half-deleted table
    if t.current_version() != 3:
        t.write(li.select("l_orderkey", "l_linenumber", "l_returnflag",
                          "l_linestatus", "l_quantity"))
        t.delete_where(F.col("l_returnflag") == "R")
        t.delete_where((F.col("l_linestatus") == "F") & (F.col("l_quantity") > 45))
    return t.read().groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("l_quantity") * 100).cast("bigint"))
        .cast("bigint")
        .alias("qty_cents"),
    )


@query(
    "similarity_ivf_recall",
    _COSINE_CTE_REF.format(qid=0)
    + f""",
    assign AS ({IVF_ASSIGN_SQL}),
    exact10 AS (SELECT vec_id FROM sims ORDER BY round(s, 6) DESC, vec_id LIMIT 10),
    qc AS (SELECT centroid_id FROM assign WHERE vec_id = 0),
    ivf10 AS (SELECT s.vec_id FROM sims s
              JOIN assign a ON a.vec_id = s.vec_id
              JOIN qc ON a.centroid_id = qc.centroid_id
              ORDER BY round(s.s, 6) DESC, s.vec_id LIMIT 10)
    SELECT count(*)::bigint AS n_overlap,
           round(count(*) / 10.0, 3) AS recall_at_10
    FROM exact10 JOIN ivf10 USING (vec_id)
    """,
    survey_ref="training: ANN quality evaluation (recall@k of IVF vs exact)",
)
def similarity_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the IVF cell-confined search against the brute-force
    exact top-10 — the evaluation loop every ANN deployment runs before
    trusting a speedup. Composes the two registered builders, so the
    measured paths are EXACTLY the production ones (same rounding, same
    tiebreaks); the oracle recomputes both sides in SQL. At 100 TB the
    exact side runs on a sampled query set — the recall estimate needs
    queries, not corpus, to be small."""
    from tipoca_stream_spark.plans.training import similarity_cosine_topk

    exact10 = similarity_cosine_topk(spark, sf_dir).select("vec_id")
    ivf10 = similarity_ivf_topk(spark, sf_dir).select("vec_id")
    return exact10.join(ivf10, "vec_id").agg(
        F.count("*").cast("bigint").alias("n_overlap"),
        F.round(F.count("*") / 10.0, 3).alias("recall_at_10"),
    )


@query(
    "storage_routed_point_read",
    """
    SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
    FROM lineitem
    WHERE l_partkey = (SELECT max(l_partkey) FROM lineitem)
    """,
    survey_ref="W2 index-aware routing: route_read picks bloom/bucket/zones/scan",
)
def storage_routed_point_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup on a SECONDARY column served through the target's
    query router (sources/target.py route_read, round 6): lineitem lands
    in a catalog-bucketed versioned target (DISTKEY = l_orderkey) with a
    delta-maintained Bloom sidecar on l_partkey; the router classifies
    the equality predicate, picks the Bloom path (bucket pruning can't
    serve a non-key column — the reference's DISTKEY-miss case), and the
    residual filter keeps the answer index-independent. Oracle = plain
    filtered scan; route choice + file pruning are pinned in
    tests/test_route_read.py, this query gates the ANSWER."""
    import hashlib
    import os
    import tempfile

    from tipoca_stream_spark.sources.target import BucketedTargetTable

    li = load_table(spark, sf_dir, "lineitem")
    tag = hashlib.sha1(f"{sf_dir}:{os.getpid()}:routed".encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"routed_li_{tag}")
    t = BucketedTargetTable(
        spark, root, "lineitem_routed", buckets=8, keys=["l_orderkey"],
        bloom_col="l_partkey",
    )
    if not t.exists():
        t.write(li.select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity"))
    key = li.agg(F.max("l_partkey")).collect()[0][0]
    if key is None:  # empty table: `col = NULL` matches nothing
        return t.read().select(
            "l_orderkey", "l_linenumber", "l_partkey", "l_quantity"
        ).filter(F.lit(False))
    routed = t.route_read(eq=("l_partkey", key))
    assert routed.route == "bloom"  # the router must actually take the index
    return routed.df.select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")


@query(
    "storage_routed_composite_read",
    """
    SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
    FROM lineitem
    WHERE l_partkey = (SELECT min(l_partkey) FROM lineitem)
      AND l_orderkey BETWEEN 1 AND (SELECT CAST(max(l_orderkey) / 2 AS BIGINT)
                                    FROM lineitem)
    """,
    survey_ref="W2 composite routing: bloom ∩ zone candidates in one read",
)
def storage_routed_composite_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-range query through the composite router (round 7,
    VERDICT r6 worklist #3): ``l_partkey = x AND l_orderkey BETWEEN a
    AND b`` schedules the INTERSECTION of the Bloom sidecar's candidate
    files (the equality class) and the zone map's overlapping files (the
    range class) — each index prunes independently, a file must survive
    both, and the conjunctive residual filter keeps the answer identical
    to a plain scan (the oracle). File-count and per-class pins live in
    tests/test_route_read.py; this query gates the ANSWER at the driver."""
    import hashlib
    import os
    import tempfile

    from tipoca_stream_spark.sources.target import BucketedTargetTable

    li = load_table(spark, sf_dir, "lineitem")
    tag = hashlib.sha1(f"{sf_dir}:{os.getpid()}:routed2".encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"routed2_li_{tag}")
    t = BucketedTargetTable(
        spark, root, "lineitem_routed2", buckets=8, keys=["l_orderkey"],
        zone_cols=["l_orderkey"], bloom_col="l_partkey",
    )
    if not t.exists():
        t.write(li.select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity"))
    lo_key, hi_order = li.agg(
        F.min("l_partkey"), (F.max("l_orderkey") / 2).cast("bigint")
    ).collect()[0]
    if lo_key is None:  # empty table: `col = NULL` matches nothing
        return t.read().select(
            "l_orderkey", "l_linenumber", "l_partkey", "l_quantity"
        ).filter(F.lit(False))
    routed = t.route_read(
        eq=("l_partkey", lo_key), between=("l_orderkey", 1, hi_order)
    )
    assert routed.route == "bloom+zones", routed.route  # both indexes must fire
    return routed.df.select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")


# --- two-round Lloyd iteration (data-dependent re-assignment) ----------------

_KMEANS_R2_ORACLE = f"""
    WITH a1 AS ({IVF_ASSIGN_SQL}),
    ex AS (
      SELECT vec_id, t.i AS pos, e.embedding[t.i]::DOUBLE AS x
      FROM embeddings e, unnest(range(1, len(e.embedding) + 1)) AS t(i)
    ),
    c1 AS (
      SELECT a1.centroid_id, ex.pos, avg(ex.x) AS c
      FROM ex JOIN a1 USING (vec_id) GROUP BY 1, 2
    ),
    d2 AS (
      SELECT ex.vec_id, c1.centroid_id AS cid,
             round(sum((ex.x - c1.c) * (ex.x - c1.c)), 6) AS d
      FROM ex JOIN c1 USING (pos) GROUP BY 1, 2
    ),
    a2 AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM d2) WHERE rn = 1
    ),
    nm AS (SELECT cid, count(*)::BIGINT AS n_members FROM a2 GROUP BY cid)
    SELECT a2.cid::INTEGER AS centroid_id, ex.pos::BIGINT AS pos,
           round(avg(ex.x), 5) AS c, any_value(nm.n_members) AS n_members
    FROM ex JOIN a2 USING (vec_id) JOIN nm ON nm.cid = a2.cid
    GROUP BY a2.cid, ex.pos
    """


@query(
    "kmeans_lloyd_round2",
    _KMEANS_R2_ORACLE,
    survey_ref="training: k-means iteration (round-2 Lloyd with data-dependent centroids)",
)
def kmeans_lloyd_round2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO Lloyd rounds end-to-end: assign to the fixed seed centroids,
    update, RE-assign every vector to the data-dependent round-1 means,
    update again — the part ``kmeans_lloyd_update`` can't pin (its
    centroids are literals; iteration correctness lives in the re-
    assignment under computed centroids). Seeds that lose all members in
    round 1 drop out (standard Lloyd small-k behavior; both engines
    derive the survivor set identically). Distances are ROUNDED before
    the argmin so last-ulp differences in the two engines' mean
    summation order can't flip a tie.

    Scale shape: round-1 assignment is the broadcast-literal argmin scan
    (no shuffle); the round-2 distance uses the long-form (pos-keyed)
    join because the k×dim round-1 mean table here is tiny — the
    driver-held-centroid loop in ``operators/kmeans.py kmeans_train`` is
    the production path for many iterations; this query pins that one
    distributed iteration of it is exactly right."""
    from tipoca_stream_spark.operators.kmeans import assign_to_centroids

    emb = _embs(spark, sf_dir)
    a1 = assign_to_centroids(emb, CENTROIDS).select("vec_id", "centroid_id")
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "x0")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).cast("long").alias("pos"),
        F.col("x0").cast("double").alias("x"),
    )
    c1 = (
        ex.join(a1, "vec_id")
        .groupBy("centroid_id", "pos")
        .agg(F.avg("x").alias("c"))
        .withColumnRenamed("centroid_id", "cid")
    )
    d2 = (
        ex.join(F.broadcast(c1), "pos")
        .groupBy("vec_id", "cid")
        .agg(
            F.round(
                F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))), 6
            ).alias("d")
        )
    )
    w = Window.partitionBy("vec_id").orderBy("d", "cid")
    a2 = (
        d2.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid")
    )
    nm = a2.groupBy("cid").agg(F.count(F.lit(1)).cast("long").alias("n_members"))
    return (
        ex.join(a2, "vec_id")
        .groupBy("cid", "pos")
        .agg(F.round(F.avg("x"), 5).alias("c"))
        .join(F.broadcast(nm), "cid")
        .select(
            F.col("cid").cast("int").alias("centroid_id"),
            "pos",
            "c",
            "n_members",
        )
    )


# --- recall-vs-nprobe operating curve ----------------------------------------

NPROBE_CURVE = (1, 2, 4, 8)


def _recall_curve_oracle() -> str:
    blocks, selects = [], []
    for p in NPROBE_CURVE:
        blocks.append(
            f"""probes{p} AS (SELECT cid FROM qdall ORDER BY round(d, 6), cid LIMIT {p}),
    ivf{p} AS (SELECT s.vec_id FROM sims s
               JOIN assign a ON a.vec_id = s.vec_id
               JOIN probes{p} pr ON a.centroid_id = pr.cid
               ORDER BY round(s.s, 6) DESC, s.vec_id LIMIT 10),
    r{p} AS (SELECT {p} AS nprobe, count(*)::BIGINT AS n_overlap,
                    round(count(*) / 10.0, 3) AS recall_at_10
             FROM exact10 JOIN ivf{p} USING (vec_id))"""
        )
        selects.append(f"SELECT * FROM r{p}")
    return (
        _COSINE_CTE_REF.format(qid=0)
        + f""",
    assign AS ({IVF_ASSIGN_SQL}),
    exact10 AS (SELECT vec_id FROM sims ORDER BY round(s, 6) DESC, vec_id LIMIT 10),
    qexpl AS (
      SELECT vec_id, unnest(embedding)::double AS x,
       {_CENTROID_UNNESTS}
      FROM embeddings WHERE vec_id = 0),
    qd AS (SELECT vec_id, {_CENTROID_D2} FROM qexpl GROUP BY vec_id),
    qdall AS ({_QD_UNION}),
    """
        + ",\n    ".join(blocks)
        + "\n    "
        + "\nUNION ALL ".join(selects)
    )


@query(
    "similarity_ivf_recall_curve",
    _recall_curve_oracle(),
    survey_ref="training: ANN operating curve (recall@10 vs nprobe)",
)
def similarity_ivf_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recall-vs-nprobe OPERATING CURVE — one row per probe count
    (1, 2, 4, 8): the table an ANN deployment reads to pick its
    latency/recall point. Meaningful only now that the cells are a real
    partition (round-8 fix: with every vector in one cell, this curve
    was flat 1.0 at every nprobe). The candidate set grows with the
    probed cells and recall must be non-decreasing in nprobe — the
    monotone staircase is itself evidence the quantizer discriminates.

    Scale shape: ONE persisted assignment pass shared by all curve
    points; each point is a broadcast probe-list join + partial top-K;
    the exact side is one brute-force scan reused across points (at
    100 TB the exact side runs on a sampled query set)."""
    from tipoca_stream_spark.plans.training import similarity_cosine_topk

    emb = _embs(spark, sf_dir)
    assign = ivf_assign(emb).persist()
    exact10 = similarity_cosine_topk(spark, sf_dir).select("vec_id")
    qvec = emb.filter(F.col("vec_id") == 0)
    qd = [
        F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.array(*[F.lit(x) for x in c]),
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias(f"d{i}")
        for i, c in enumerate(CENTROIDS)
    ]
    qdall = qvec.select(*qd).select(
        F.posexplode(
            F.array(*[F.col(f"d{i}") for i in range(N_CENTROIDS)])
        ).alias("cid", "d")
    )
    q = qvec.select(
        F.col("embedding").alias("_q"), sim._norm(F.col("embedding")).alias("_qn")
    )
    out = None
    for p in NPROBE_CURVE:
        # round before ordering (ADVICE r8): the cross-engine discipline
        # for every other argmin in this file — a last-ulp summation
        # difference between Spark's fold order and DuckDB's aggregate
        # order must not flip a near-tied probe choice (ties at 6
        # decimals resolve by cid on both sides)
        probes = (
            qdall.orderBy(F.round(F.col("d"), 6), "cid").limit(p).select("cid")
        )
        cands = (
            emb.join(assign, "vec_id")
            .join(F.broadcast(probes), F.col("centroid_id") == F.col("cid"))
            .filter(F.col("vec_id") != 0)
            .crossJoin(F.broadcast(q))
        )
        ivf10 = (
            cands.select(
                "vec_id",
                F.round(
                    sim.cosine_prenormed(
                        F.col("embedding"), F.col("_q"),
                        sim._norm(F.col("embedding")), F.col("_qn"),
                    ),
                    6,
                ).alias("s"),
            )
            .orderBy(F.col("s").desc(), "vec_id")
            .limit(10)
            .select("vec_id")
        )
        row = exact10.join(ivf10, "vec_id").agg(
            F.lit(p).cast("int").alias("nprobe"),
            F.count(F.lit(1)).cast("long").alias("n_overlap"),
            F.round(F.count(F.lit(1)) / 10.0, 3).alias("recall_at_10"),
        ).select("nprobe", "n_overlap", "recall_at_10")
        out = row if out is None else out.unionByName(row)
    return out


# --- change-data-feed read -----------------------------------------------------

_CDF_ORACLE = """
    WITH base AS (
      SELECT user_id, count(*)::BIGINT AS n_events,
             sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS total_cents
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ),
    v1 AS (SELECT * FROM base),
    v2 AS (
      SELECT user_id, n_events,
             total_cents + CASE WHEN user_id % 7 = 0 THEN 100 ELSE 0 END AS total_cents
      FROM base WHERE user_id % 11 <> 0
      UNION ALL
      SELECT user_id + 1000000, n_events, total_cents + 5
      FROM base WHERE user_id % 13 = 0
    ),
    ins AS (SELECT v2.* FROM v2 WHERE user_id NOT IN (SELECT user_id FROM v1)),
    del AS (SELECT v1.* FROM v1 WHERE user_id NOT IN (SELECT user_id FROM v2)),
    upd AS (
      SELECT v1.user_id, v1.n_events AS n1, v1.total_cents AS t1,
             v2.n_events AS n2, v2.total_cents AS t2
      FROM v1 JOIN v2 USING (user_id)
      WHERE v1.n_events IS DISTINCT FROM v2.n_events
         OR v1.total_cents IS DISTINCT FROM v2.total_cents
    ),
    tagged AS (
      SELECT 'insert' AS _change_type, user_id, total_cents FROM ins
      UNION ALL SELECT 'delete', user_id, total_cents FROM del
      UNION ALL SELECT 'update_preimage', user_id, t1 FROM upd
      UNION ALL SELECT 'update_postimage', user_id, t2 FROM upd
    )
    SELECT _change_type, count(*)::BIGINT AS n_rows,
           sum(user_id)::BIGINT AS sum_user_id,
           sum(total_cents)::BIGINT AS sum_total_cents
    FROM tagged GROUP BY _change_type
    """


@query(
    "storage_cdf_read",
    _CDF_ORACLE,
    survey_ref="storage: change-data-feed between versions (Delta CDF vocabulary)",
)
def storage_cdf_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed between two committed versions of a versioned
    target, graded end to end: v1 is a per-user aggregate of the events
    table, v2 applies a deterministic update/delete/insert mix, and
    ``ParquetTargetTable.changes(v1, v2, keys)`` must tag every row with
    the Delta CDF vocabulary (insert / delete / update_preimage /
    update_postimage) — the consumer contract that lets a cache or
    reverse-ETL sink apply O(changed rows). The oracle recomputes both
    version row sets and classifies the diff itself, so a mis-tagged or
    missed row breaks the hash. (The O(touched-buckets) inode-pruned CDF
    path is pinned separately in tests/test_timetravel.py; this grades
    the ANSWER contract.)"""
    import hashlib
    import os
    import shutil
    import tempfile

    from tipoca_stream_spark.sources.target import ParquetTargetTable

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    base = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias(
            "total_cents"
        ),
    )
    v2_df = (
        base.filter(F.col("user_id") % 11 != 0)
        .select(
            "user_id",
            "n_events",
            (
                F.col("total_cents")
                + F.when(F.col("user_id") % 7 == 0, 100).otherwise(0)
            ).cast("long").alias("total_cents"),
        )
        .unionByName(
            base.filter(F.col("user_id") % 13 == 0).select(
                (F.col("user_id") + 1000000).alias("user_id"),
                "n_events",
                (F.col("total_cents") + 5).cast("long").alias("total_cents"),
            )
        )
    )
    tag = hashlib.sha1(f"{sf_dir}:{os.getpid()}:cdf".encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"cdf_ev_{tag}")
    t = ParquetTargetTable(spark, root, "events_cdf")
    if t.current_version() != 2:
        # partial state (crash between the two writes would leave v=1):
        # rebuilding ON TOP would land base+v2 as versions 2-3 and
        # changes(1,2) would silently diff base against base — wipe and
        # rebuild from scratch instead (ADVICE r8)
        if t.current_version() is not None:
            shutil.rmtree(root, ignore_errors=True)
            t = ParquetTargetTable(spark, root, "events_cdf")
        t.write(base)
        t.write(v2_df)
    ch = t.changes(1, 2, keys=["user_id"])
    return ch.groupBy("_change_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("user_id").cast("long").alias("sum_user_id"),
        F.sum("total_cents").cast("long").alias("sum_total_cents"),
    )


# --- time-travel read -----------------------------------------------------------

_TIME_TRAVEL_ORACLE = """
    WITH base AS (
      SELECT user_id, count(*)::BIGINT AS n_events,
             sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS total_cents
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    )
    SELECT 1 AS version, count(*)::BIGINT AS n_rows,
           sum(user_id)::BIGINT AS sum_user_id,
           sum(total_cents)::BIGINT AS sum_total_cents
    FROM base
    UNION ALL
    SELECT 2, count(*)::BIGINT, sum(user_id)::BIGINT, sum(total_cents)::BIGINT
    FROM (
      SELECT user_id, total_cents
      FROM base WHERE user_id % 11 <> 0
      UNION ALL
      SELECT user_id + 1000000, total_cents + 5
      FROM base WHERE user_id % 13 = 0
    )
    """


@query(
    "storage_time_travel_read",
    _TIME_TRAVEL_ORACLE,
    survey_ref="storage: time-travel reads (every retained version answerable)",
)
def storage_time_travel_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel graded end-to-end: commit two versions of a versioned
    target, then read BOTH — ``read(version=1)`` must still answer
    exactly after v2 is committed (versions are immutable; the pointer
    flip never mutates history), and the oracle recomputes each
    version's content independently. One summary row per version so a
    stale read, a leaked v2 row into v1, or a hard-link gone wrong
    breaks the hash. (Refuse-uncommitted and janitor semantics are
    pinned in tests/test_timetravel.py; this grades the answer.)"""
    import hashlib
    import os
    import shutil
    import tempfile

    from tipoca_stream_spark.sources.target import ParquetTargetTable

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    base = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias(
            "total_cents"
        ),
    )
    v2_df = (
        base.filter(F.col("user_id") % 11 != 0)
        .select("user_id", "n_events", "total_cents")
        .unionByName(
            base.filter(F.col("user_id") % 13 == 0).select(
                (F.col("user_id") + 1000000).alias("user_id"),
                "n_events",
                (F.col("total_cents") + 5).cast("long").alias("total_cents"),
            )
        )
    )
    tag = hashlib.sha1(f"{sf_dir}:{os.getpid()}:tt".encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"tt_ev_{tag}")
    t = ParquetTargetTable(spark, root, "events_tt")
    if t.current_version() != 2:
        # same partial-state hazard as storage_cdf_read: a v=1 leftover
        # must not shift base/v2 to versions 2-3 (version 1 would then BE
        # the base) — wipe and rebuild (ADVICE r8)
        if t.current_version() is not None:
            shutil.rmtree(root, ignore_errors=True)
            t = ParquetTargetTable(spark, root, "events_tt")
        t.write(base)
        t.write(v2_df)

    def summarize(version: int) -> DataFrame:
        return t.read(version=version).agg(
            F.lit(version).alias("version"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("user_id").cast("long").alias("sum_user_id"),
            F.sum("total_cents").cast("long").alias("sum_total_cents"),
        ).select("version", "n_rows", "sum_user_id", "sum_total_cents")

    return summarize(1).unionByName(summarize(2))
