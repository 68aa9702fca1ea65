"""Near-duplicate clustering: pairwise signals → connected components →
canonical keeper per cluster. The iterative Spark operator is oracle-checked
against a DuckDB recursive CTE computing min-reachable-id per node."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tipoca_stream_spark.operators.components import connected_components
from tipoca_stream_spark.operators import corpus_dedup as cd
from tipoca_stream_spark.plans.registry import query
from tipoca_stream_spark.plans.training import JACCARD_THRESHOLD, _docs

# CTE prefix shared with downstream oracles (e.g. canonical-doc selection
# in plans/mix.py): everything up to and including `reach`.
COMPONENTS_CTES = f"""
WITH RECURSIVE
words AS (SELECT doc_id, source, unnest(list_distinct(string_split(text, ' '))) AS w
          FROM documents),
cnt AS (SELECT doc_id, count(*) AS n FROM words GROUP BY doc_id),
jpairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
           FROM words a JOIN words b ON a.w = b.w AND a.source = b.source
           WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
jacc AS (SELECT id_a, id_b
         FROM jpairs JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
         WHERE common::double / (ca.n + cb.n - common) >= {JACCARD_THRESHOLD}),
exact AS (SELECT min(doc_id) OVER (PARTITION BY md5(text)) AS id_a, doc_id AS id_b
          FROM documents),
edges0 AS (SELECT id_a, id_b FROM jacc
           UNION SELECT id_a, id_b FROM exact WHERE id_a <> id_b),
edges AS (SELECT id_a AS s, id_b AS d FROM edges0
          UNION SELECT id_b AS s, id_a AS d FROM edges0),
reach AS (
  SELECT s AS node, s AS lbl FROM edges
  UNION
  SELECT e.d AS node, r.lbl AS lbl FROM reach r JOIN edges e ON e.s = r.node
)
"""

COMPONENTS_ORACLE = (
    COMPONENTS_CTES
    + "SELECT node AS doc_id, min(lbl) AS component FROM reach GROUP BY node"
)


@query(
    "dedup_components",
    COMPONENTS_ORACLE,
    survey_ref="training: near-dup clustering (iterative)",
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster near-duplicates: edges = n-gram-Jaccard pairs ∪ exact-dup
    star edges (keeper→member — linear in group size, never the quadratic
    all-pairs expansion), then min-label propagation to a fixpoint. The
    component id is the smallest doc_id in the cluster — the conventional
    'keeper'."""
    docs = _docs(spark, sf_dir)
    jacc = cd.ngram_jaccard_pairs(docs, "text", "doc_id", "source", JACCARD_THRESHOLD).select(
        "id_a", "id_b"
    )
    keeper = F.min("doc_id").over(Window.partitionBy(F.md5("text")))
    exact = (
        docs.select(keeper.alias("id_a"), F.col("doc_id").alias("id_b"))
        .filter(F.col("id_a") != F.col("id_b"))
    )
    # no .distinct() here: connected_components symmetrizes and dedupes
    # its input itself, so a pre-distinct is a second full exchange of the
    # edge set for nothing (guide §2.4 — "a distinct on data that is
    # already unique"); duplicate edges cannot change a component
    edges = jacc.union(exact)
    comps = connected_components(edges, src="id_a", dst="id_b")
    return comps.select(F.col("node").alias("doc_id"), "component")
