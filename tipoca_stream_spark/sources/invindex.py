"""Persisted inverted index: postings + document stats on disk, BM25
served off the index without touching the corpus.

``text_bm25_retrieval`` (plans/textvec.py) proves the scoring math but
re-tokenizes the corpus per query — right for one-off decontamination
sweeps, wrong for a retrieval-mix pipeline issuing thousands of queries.
This table is the classic search-engine split: build once (the one full
tokenize + aggregate pass), then each query reads ONLY the |Q| query
terms' posting lists:

- **postings/**: (term, doc_id, tf), hash-partitioned AND sorted by term
  — every term's postings co-locate in one file, and the within-file
  sort gives parquet row-group min/max stats on ``term``, so a
  ``term IN (...)`` probe prunes row groups inside the file too (the
  text analogue of the zone maps' file skipping).
- **doclen/**: (doc_id, dl) — the BM25 length normalizer.
- **_totals/**: one row (n_docs, avgdl) — broadcast at query time.

Query cost at 100 TB: |Q| pushed-filter posting reads (data ∝ document
frequency of the query terms, NOT corpus size) + a doclen join keyed on
doc_id + TakeOrderedAndProject. The scoring expression is shared with
``operators.text.bm25_topk`` character-for-character (same constants,
same 6-dp round-before-sum), so index-served scores are identical to
scan-served scores — pinned by test and by the driver oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def okapi_score(
    tf: DataFrame, totals: DataFrame, k1: float, b: float, k: int
) -> DataFrame:
    """THE Okapi BM25 scoring definition — the one copy every serving
    path shares (this standalone index, the CDC target's posting sidecar,
    and its scan fallback), so "index-served ≡ scan-served" can never
    drift on a constant or rounding tweak. ``tf``: (doc_id, term, tf, dl)
    posting rows (term-filtered by the caller); ``totals``: one row
    (n_docs, avgdl), broadcast. Same 6-dp round-before-sum as the DuckDB
    oracles."""
    dfreq = tf.groupBy("term").agg(F.count("*").alias("dfreq"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(totals))
        .select(
            "doc_id",
            F.round(
                F.log(
                    (F.col("n_docs") - F.col("dfreq") + 0.5)
                    / (F.col("dfreq") + 0.5)
                    + 1.0
                )
                * (F.col("tf") * (k1 + 1))
                / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
                6,
            ).alias("term_score"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("term_score"), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("doc_id"))
        .limit(k)
    )


class InvertedIndexTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    @property
    def _postings(self) -> str:
        return os.path.join(self.path, "postings")

    @property
    def _doclen(self) -> str:
        return os.path.join(self.path, "doclen")

    @property
    def _totals(self) -> str:
        return os.path.join(self.path, "_totals")

    @property
    def _postings_pos(self) -> str:
        return os.path.join(self.path, "postings_pos")

    def exists(self) -> bool:
        return os.path.exists(self._totals)

    def build(
        self,
        docs: DataFrame,
        text_col: str,
        id_col: str,
        n_files: int = 8,
        positional: bool = False,
    ) -> None:
        """One tokenize pass feeds all three tables. Tokenization is the
        repo-wide convention (split on single space, drop empties) —
        identical to operators.text.bm25_topk and the DuckDB oracles.

        ``positional=True`` additionally persists ``postings_pos/``:
        (term, doc_id, pos) rows, term-hashed and term-sorted like the
        frequency postings, carrying each occurrence's 0-based token
        position. This is what phrase queries need — a frequency index
        can say two words co-occur in a document but not that they are
        ADJACENT. Costs one extra copy of the token stream (the classic
        positional-index space trade, ~2-4× the frequency postings)."""
        tokens_pos = docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "term"),
        ).filter(F.col("term") != "")
        tokens = tokens_pos.select("doc_id", "term")
        if positional:
            (
                tokens_pos.repartition(n_files, "term")
                .sortWithinPartitions("term")
                .write.mode("overwrite")
                .parquet(self._postings_pos)
            )
        postings = tokens.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
        (
            postings.repartition(n_files, "term")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(self._postings)
        )
        doclen = tokens.groupBy("doc_id").agg(F.count("*").alias("dl"))
        doclen.write.mode("overwrite").parquet(self._doclen)
        (
            doclen.agg(
                F.count("*").cast("double").alias("n_docs"),
                F.avg("dl").alias("avgdl"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(self._totals)
        )

    def phrase_counts(self, terms: list[str]) -> DataFrame:
        """(doc_id, n_occurrences) of the exact consecutive phrase,
        served off the positional postings — the corpus is never
        rescanned. Cost: |phrase| pushed ``term =`` posting reads (file +
        row-group pruning via the build-time term sort), chained
        (doc_id, pos)-keyed joins — each join's inputs are
        term-frequency-sized, not corpus-sized, which is the whole point
        of a positional index at 100 TB. Duplicate terms in the phrase
        self-join the same posting list (correct: 'the the' matches
        positions p, p+1 both holding 'the')."""
        if not terms:
            raise ValueError("phrase_counts needs at least one term")
        if not os.path.exists(self._postings_pos):
            raise FileNotFoundError(
                "no positional postings — build(..., positional=True) first"
            )
        pp = self.spark.read.parquet(self._postings_pos).filter(
            F.col("term").isin(list(terms))
        )
        base = pp.filter(F.col("term") == terms[0]).select("doc_id", "pos")
        for i, t in enumerate(terms[1:], start=1):
            nxt = pp.filter(F.col("term") == t).select(
                "doc_id", (F.col("pos") - i).alias("pos")
            )
            base = base.join(nxt, ["doc_id", "pos"])
        return base.groupBy("doc_id").agg(F.count("*").alias("n_occurrences"))

    def bm25_topk(
        self,
        query_terms: list[str],
        k1: float = 1.2,
        b: float = 0.75,
        k: int = 10,
    ) -> DataFrame:
        """Top-k (doc_id, bm25) for a term bag, corpus untouched. The
        ``term IN`` filter pushes into the postings scan (file + row-group
        pruning via the build-time term sort)."""
        tf = self.spark.read.parquet(self._postings).filter(
            F.col("term").isin(list(query_terms))
        )
        # this layout normalizes dl into doclen/ (the target sidecar
        # denormalizes it into the posting rows) — join it in, then score
        # through the ONE shared Okapi definition
        doclen = self.spark.read.parquet(self._doclen)
        totals = self.spark.read.parquet(self._totals)
        return okapi_score(tf.join(doclen, "doc_id"), totals, k1, b, k)
