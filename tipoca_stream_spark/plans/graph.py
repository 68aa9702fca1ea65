"""Graph-ranking queries: PageRank over data-derived graphs.

The oracle unrolls the fixed iteration count into chained CTEs — one
(join + group-sum) pair per round, exactly mirroring the Spark loop in
operators/pagerank.py — so DuckDB computes the identical fixpoint prefix
and the driver's value-hash comparison stays exact (6-dp rounding absorbs
summation-order float noise, the repo-wide convention)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tipoca_stream_spark.operators.bfs import bfs_distances
from tipoca_stream_spark.operators.labelprop import label_propagation
from tipoca_stream_spark.operators.pagerank import pagerank
from tipoca_stream_spark.operators.triangles import triangle_counts
from tipoca_stream_spark.plans.analytics import cooccurrence_pairs
from tipoca_stream_spark.plans.registry import query
from tipoca_stream_spark.sources.tables import load_table

DAMPING = 0.85
ITERS = 3


def _pagerank_oracle(iters: int = ITERS, damping: float = DAMPING) -> str:
    """Unrolled PageRank CTE chain over the supplier↔part bipartite graph."""
    ctes = [
        "le AS (SELECT DISTINCT l_suppkey AS sk, l_partkey AS pk FROM lineitem)",
        "edges AS (SELECT 's' || sk AS src, 'p' || pk AS dst FROM le"
        " UNION ALL SELECT 'p' || pk, 's' || sk FROM le)",
        "deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)",
        "nodes AS (SELECT DISTINCT src AS node FROM edges)",
        "nn AS (SELECT count(*)::double AS n FROM nodes)",
        "pr0 AS (SELECT node, 1.0 / n AS pr FROM nodes CROSS JOIN nn)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"mass{i} AS (SELECT e.dst AS node, sum(p.pr / d.outdeg) AS mass"
            f" FROM edges e JOIN pr{i - 1} p ON p.node = e.src"
            f" JOIN deg d ON d.src = e.src GROUP BY e.dst)"
        )
        ctes.append(
            f"pr{i} AS (SELECT nd.node,"
            f" (1 - {damping}) / nn.n + {damping} * coalesce(m.mass, 0) AS pr"
            f" FROM nodes nd CROSS JOIN nn LEFT JOIN mass{i} m ON m.node = nd.node)"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, round(pr, 6) AS pagerank FROM pr{iters}"
    )


@query(
    "graph_pagerank_supplier_part",
    _pagerank_oracle(),
    survey_ref="training: graph ranking (iterative PageRank)",
)
def graph_pagerank_supplier_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank suppliers and parts by centrality in the who-supplies-what
    graph (symmetrized bipartite edges from lineitem). The same operator
    ranks near-dup cluster members by linkage; this graph is chosen for
    the gate because it is deterministic at every scale factor."""
    li = load_table(spark, sf_dir, "lineitem")
    # nodes are LONGS through the iterations (parity-tagged: supplier =
    # 2k, part = 2k+1) and decode to the oracle's "s<k>"/"p<k>" strings
    # only at output: every per-iteration shuffle keys on an 8-byte long
    # instead of a variable-length string — ~27% faster at sf0.1, and the
    # gap widens with edge count (round-5 measurement, bitwise-identical
    # result)
    pairs = li.select(
        (F.col("l_suppkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    ).distinct()
    edges = pairs.union(pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # edges_distinct: pairs is distinct and the parity tagging makes the
    # swapped union disjoint (even→odd vs odd→even), so the operator's
    # internal de-dup exchange is provably redundant here (guide §2.4)
    ranks = pagerank(edges, damping=DAMPING, iters=ITERS, edges_distinct=True)
    node_str = (
        F.when(
            F.col("node") % 2 == 0,
            F.concat(F.lit("s"), F.shiftright("node", 1).cast("string")),
        ).otherwise(F.concat(F.lit("p"), F.shiftright("node", 1).cast("string")))
    )
    return ranks.select(node_str.alias("node"), F.round("pr", 6).alias("pagerank"))


@query(
    "graph_triangle_counts",
    """
    WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
          FROM lp a JOIN lp b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1
      JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
      JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
    pernode AS (
      SELECT node, count(*)::BIGINT AS n_triangles FROM (
        SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri)
      GROUP BY node)
    SELECT node, n_triangles FROM pernode
    ORDER BY n_triangles DESC, node LIMIT 20
    """,
    survey_ref="training: graph triangle counting (community density)",
)
def graph_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by triangle participation in the co-purchase graph
    (parts sharing an order are adjacent). The oracle enumerates triangles
    with the naive id-ordered 3-way join — correct but hub-quadratic; the
    Spark operator uses degree-ordered orientation (operators/triangles.py)
    which produces the IDENTICAL per-node counts while bounding the wedge
    stage to O(m^1.5) on any degree distribution. Same semantics, the
    100x-scale physical plan. Edges come from the same capped single-shuffle
    group expansion as analytics_part_cooccurrence."""
    edges = cooccurrence_pairs(
        load_table(spark, sf_dir, "lineitem"),
        key_col="l_orderkey",
        item_col="l_partkey",
        out_a="a",
        out_b="b",
        n_col="n_orders",
        min_count=1,
        max_group_size=256,
        observation="triangle_edge_hot_group_drops",
        # round 14: the triangle pass only needs the edge SET — skip the
        # pair-count shuffle here and the re-canonicalization dedup inside
        # triangle_counts (2 edge-cardinality exchanges removed; counts
        # identical, oracle unchanged)
        distinct_only=True,
    )
    counts = triangle_counts(edges, "a", "b", edges_canonical=True)
    return counts.orderBy(F.desc("n_triangles"), F.asc("node")).limit(20)


LPA_ITERS = 3


def _lpa_oracle(iters: int = LPA_ITERS) -> str:
    """Unrolled synchronous label propagation over the co-purchase graph —
    the same chained-CTE discipline as the PageRank oracle: one
    (count + argmax + carry) CTE triple per round, argmax via
    row_number ORDER BY cnt DESC, label ASC (the operator's min_by over
    (-cnt, label) computes the identical winner in one reduce)."""
    ctes = [
        "lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)",
        "pairs AS (SELECT a.l_partkey AS a, b.l_partkey AS b"
        " FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey"
        " AND a.l_partkey < b.l_partkey GROUP BY 1, 2 HAVING count(*) >= 2)",
        "sym AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs)",
        "nodes AS (SELECT DISTINCT a AS node FROM sym)",
        "l0 AS (SELECT node, node AS label FROM nodes)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"cnt{i} AS (SELECT s.a AS node, l.label AS nl, count(*) AS cnt"
            f" FROM sym s JOIN l{i - 1} l ON l.node = s.b GROUP BY 1, 2)"
        )
        ctes.append(
            f"best{i} AS (SELECT node, nl AS label FROM ("
            f"SELECT node, nl, row_number() OVER (PARTITION BY node"
            f" ORDER BY cnt DESC, nl ASC) AS rn FROM cnt{i}) WHERE rn = 1)"
        )
        ctes.append(
            f"l{i} AS (SELECT n.node, coalesce(b.label, p.label) AS label"
            f" FROM nodes n JOIN l{i - 1} p ON p.node = n.node"
            f" LEFT JOIN best{i} b ON b.node = n.node)"
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT node, label FROM l{iters}"


@query(
    "graph_label_propagation",
    _lpa_oracle(),
    survey_ref="training: community detection (synchronous LPA)",
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Communities in the part co-purchase graph (edges = part pairs
    sharing >= 2 orders, the same capped expansion as the co-occurrence
    query) by fixed-round synchronous label propagation — components finds
    reachability, LPA finds the densely-linked neighborhoods inside it.
    Deterministic: most-frequent neighbor label, smallest-label tie-break,
    3 rounds (operators/labelprop.py)."""
    edges = cooccurrence_pairs(
        load_table(spark, sf_dir, "lineitem"),
        key_col="l_orderkey",
        item_col="l_partkey",
        out_a="a",
        out_b="b",
        n_col="n_orders",
        min_count=2,
        max_group_size=256,
        observation="lpa_edge_hot_group_drops",
    )
    # edges_canonical: cooccurrence_pairs emits distinct a < b pairs, so
    # the operator's post-symmetrize de-dup exchange is redundant (§2.4)
    return label_propagation(edges, "a", "b", iters=LPA_ITERS, edges_canonical=True)


BFS_HOPS = 4


def _bfs_oracle(max_hops: int = BFS_HOPS) -> str:
    """Unrolled level-synchronous BFS: one (expand + EXCEPT-visited +
    union) CTE triple per hop — the exact frontier discipline of
    operators/bfs.py, so distances match row-for-row."""
    ctes = [
        "le AS (SELECT DISTINCT l_suppkey AS sk, l_partkey AS pk FROM lineitem)",
        "edges AS (SELECT 's' || sk AS src, 'p' || pk AS dst FROM le"
        " UNION ALL SELECT 'p' || pk, 's' || sk FROM le)",
        "d0 AS (SELECT 's' || s_suppkey AS node, 0 AS dist"
        " FROM supplier WHERE s_suppkey % 7 = 0)",
        "f0 AS (SELECT node FROM d0)",
    ]
    for i in range(1, max_hops + 1):
        ctes.append(
            f"n{i} AS (SELECT DISTINCT e.dst AS node"
            f" FROM edges e JOIN f{i - 1} f ON f.node = e.src)"
        )
        ctes.append(
            f"f{i} AS (SELECT node FROM n{i} EXCEPT SELECT node FROM d{i - 1})"
        )
        ctes.append(
            f"d{i} AS (SELECT node, dist FROM d{i - 1}"
            f" UNION ALL SELECT node, {i} AS dist FROM f{i})"
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT node, dist FROM d{max_hops}"


@query(
    "graph_bfs_distances",
    _bfs_oracle(),
    survey_ref="training: seed-set hop distance (multi-source BFS)",
)
def graph_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min hop count from a deterministic seed-supplier set (s_suppkey
    divisible by 7 — non-empty at every SF) over the supplier<->part
    bipartite graph, <= 4 hops. Same long-id parity encoding as
    PageRank (supplier 2k, part 2k+1; strings only at output) so every
    frontier shuffle keys on an 8-byte long. Seed-set reachability is
    the contamination-tracing primitive: 'how close is this item to a
    trusted/banned seed'."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select(
        (F.col("l_suppkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    ).distinct()
    edges = pairs.union(pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    seeds = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_suppkey") % 7 == 0)
        .select((F.col("s_suppkey") * 2).alias("node"))
    )
    dist = bfs_distances(edges, seeds, max_hops=BFS_HOPS)
    node_str = (
        F.when(
            F.col("node") % 2 == 0,
            F.concat(F.lit("s"), F.shiftright("node", 1).cast("string")),
        ).otherwise(F.concat(F.lit("p"), F.shiftright("node", 1).cast("string")))
    )
    return dist.select(node_str.alias("node"), "dist")


KCORE_K = 2  # the synthetic co-purchase n>=2 graph is near-regular and sparse at
# larger SF: k=3 peels to ZERO rows at sf0.1 (round-8 degeneracy audit); k=2
# survives AND discriminates at every SF (200 / 1535 / 13 survivors at
# sf0.001/0.01/0.1 — re-measured round 9; ROUND8_NOTES.md:399 had it right,
# this comment previously said 22)
KCORE_ROUNDS = 3


def _kcore_oracle(k: int = KCORE_K, rounds: int = KCORE_ROUNDS) -> str:
    """Unrolled peeling: one (degree-keep + two-endpoint restrict) CTE
    pair per round over the same co-purchase edge prefix as the LPA
    oracle — the graph-family convention of pinning the fixpoint prefix."""
    ctes = [
        "lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)",
        "pairs AS (SELECT a.l_partkey AS a, b.l_partkey AS b"
        " FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey"
        " AND a.l_partkey < b.l_partkey GROUP BY 1, 2 HAVING count(*) >= 2)",
        "e0 AS (SELECT a AS src, b AS dst FROM pairs"
        " UNION SELECT b, a FROM pairs)",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"keep{r} AS (SELECT src FROM e{r - 1}"
            f" GROUP BY src HAVING count(*) >= {k})"
        )
        ctes.append(
            f"e{r} AS (SELECT e.src, e.dst FROM e{r - 1} e"
            f" WHERE e.src IN (SELECT src FROM keep{r})"
            f" AND e.dst IN (SELECT src FROM keep{r}))"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT src AS node, count(*) AS deg FROM e{rounds} GROUP BY src"
    )


@query(
    "graph_kcore",
    _kcore_oracle(),
    survey_ref="training: k-core density filter (iterative peeling)",
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 peeling rounds toward the 3-core of the part co-purchase graph
    (same capped edge derivation as LPA): nodes surviving with their
    peeled-graph degree. The core is the 'structurally supported' set —
    near-dup cluster members held by >= k independent neighbors, the
    filter that separates genuine template families from chance pair
    hits. operators/kcore.py also runs to the true fixpoint
    (until_stable); the registered form is fixed-round so the oracle
    unrolls the identical prefix."""
    from tipoca_stream_spark.operators.kcore import kcore

    pairs = cooccurrence_pairs(
        load_table(spark, sf_dir, "lineitem"),
        key_col="l_orderkey",
        item_col="l_partkey",
        out_a="a",
        out_b="b",
        n_col="n_orders",
        min_count=2,
        max_group_size=256,
        observation="kcore_edge_hot_group_drops",
    )
    # no .distinct(): cooccurrence_pairs emits distinct a < b pairs, so
    # the swapped union is disjoint by construction — the de-dup exchange
    # was provably a no-op (guide §2.4); degrees (and the peel) see the
    # identical edge multiset
    edges = pairs.select("a", "b").union(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    return kcore(edges, k=KCORE_K, src="a", dst="b", rounds=KCORE_ROUNDS)


# --- local clustering coefficient ---------------------------------------------

_CLUSTERING_ORACLE = """
    WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
          FROM lp a JOIN lp b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1
      JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
      JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
    pernode AS (
      SELECT node, count(*)::BIGINT AS n_triangles FROM (
        SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri)
      GROUP BY node),
    deg AS (
      SELECT node, count(*)::BIGINT AS degree FROM (
        SELECT a AS node FROM e UNION ALL SELECT b FROM e)
      GROUP BY node)
    SELECT d.node, d.degree,
           coalesce(p.n_triangles, 0)::BIGINT AS n_triangles,
           round(2.0 * coalesce(p.n_triangles, 0)
                 / (d.degree * (d.degree - 1)), 6) AS clustering_coeff
    FROM deg d LEFT JOIN pernode p ON p.node = d.node
    WHERE d.degree >= 2
    ORDER BY round(2.0 * coalesce(p.n_triangles, 0)
                   / (d.degree * (d.degree - 1)), 6) DESC, d.node
    LIMIT 20
    """


@query(
    "graph_clustering_coefficient",
    _CLUSTERING_ORACLE,
    survey_ref="training: local clustering coefficient (neighborhood density)",
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient — 2·triangles / (deg·(deg−1)) per
    node — the neighborhood-density audit that separates genuinely
    cohesive near-dup/template families (neighbors that also co-occur
    with each other) from hub artifacts (a boilerplate shingle touching
    everything but whose neighbors are strangers). Top-20 by the
    ROUNDED coefficient with node tie-break so both engines rank ties
    identically; nodes need degree ≥ 2 for the ratio to exist.

    Oracle data assumption (ADVICE r8, same adjudication as the
    triangle/kcore/lpa queries): the Spark side passes
    ``max_group_size=256`` to ``cooccurrence_pairs`` (hot-group cap —
    an order with thousands of distinct parts would otherwise expand
    quadratically in one task) but the DuckDB oracle models NO cap.
    Equality therefore assumes no order exceeds 256 distinct parts —
    true of the TPC-H-shaped testdata (≤ 7 parts/order at every SF);
    on wilder data, mirror the cap in the oracle or raise it.

    Scale shape: the triangle side is the registered degree-ordered
    O(m^1.5) wedge plan; degrees are one map-side-combined aggregate of
    the same edge table; the division is a broadcast-free projection and
    the top-20 is TakeOrderedAndProject."""
    edges = cooccurrence_pairs(
        load_table(spark, sf_dir, "lineitem"),
        key_col="l_orderkey",
        item_col="l_partkey",
        out_a="a",
        out_b="b",
        n_col="n_orders",
        min_count=1,
        max_group_size=256,
        observation="clustering_edge_hot_group_drops",
    )
    counts = triangle_counts(edges, "a", "b")
    deg = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    cc = F.round(
        2.0
        * F.coalesce(F.col("n_triangles"), F.lit(0))
        / (F.col("degree") * (F.col("degree") - 1)),
        6,
    )
    return (
        deg.join(counts, deg.node == counts.node, "left")
        .select(
            deg.node.alias("node"),
            "degree",
            F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias(
                "n_triangles"
            ),
            cc.alias("clustering_coeff"),
        )
        .filter(F.col("degree") >= 2)
        .orderBy(F.col("clustering_coeff").desc(), "node")
        .limit(20)
    )
