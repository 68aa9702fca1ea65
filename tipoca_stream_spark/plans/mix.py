"""Training-mix engineering: stratified sampling, source/language
rebalancing weights, canonical-doc selection per near-dup cluster, shard
statistics, and sequence-packing accounting.

These are the steps that turn a deduped corpus into an actual training
mixture: sample per stratum, compute up/down-weighting against a target
mix, keep one representative per duplicate cluster, and budget sequences.
Everything is a deterministic function of stable ids (salted-md5 ordering,
never ``rand()``), exact-integer arithmetic until a final division, so the
DuckDB oracle reproduces each row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tipoca_stream_spark.operators import corpus_dedup as cd
from tipoca_stream_spark.operators.components import connected_components
from tipoca_stream_spark.plans.clustering import COMPONENTS_CTES
from tipoca_stream_spark.plans.registry import query
from tipoca_stream_spark.plans.training import JACCARD_THRESHOLD
from tipoca_stream_spark.sources.tables import load_table

SAMPLE_SALT = "sample-v1"
SAMPLE_PER_LANG = 5
N_SHARDS = 8
SEQ_LEN = 128

# uniform target over the 5 corpus languages
TARGET_SHARE = 0.2


def _rank_hex(col):
    """Deterministic pseudo-random sort key: md5(id || salt). String
    compare of the full digest — identical ordering in both engines."""
    return F.md5(F.concat(col.cast("string"), F.lit(SAMPLE_SALT)))


@query(
    "corpus_stratified_sample",
    f"""
    SELECT lang, doc_id FROM (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(doc_id::VARCHAR || '{SAMPLE_SALT}'), doc_id) AS rn
      FROM documents)
    WHERE rn <= {SAMPLE_PER_LANG}
    """,
    survey_ref="training: stratified sampling",
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language sample of {SAMPLE_PER_LANG} docs, ordered by a salted
    hash — a reproducible 'random' draw that is a pure function of
    doc_id, stable under any partitioning or cluster size. One window
    per stratum key; at 100 TB the per-lang partitions are the only
    shuffle and the rank filter keeps k rows per partition."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(_rank_hex(F.col("doc_id")), F.col("doc_id"))
    return (
        docs.select("lang", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= SAMPLE_PER_LANG)
        .select("lang", "doc_id")
    )


@query(
    "corpus_mix_weights",
    f"""
    WITH counts AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
    tot AS (SELECT sum(n_docs)::double AS t FROM counts)
    SELECT lang, n_docs,
           round(n_docs / t, 6) AS actual_share,
           round({TARGET_SHARE} * t / n_docs, 6) AS weight
    FROM counts, tot
    """,
    survey_ref="training: mix rebalancing",
)
def corpus_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language sampling weight to hit a uniform target mix:
    weight = target_share / actual_share. One map-side-combined count by
    lang plus a 1-row broadcast total — nothing scales with corpus size
    after the first aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    tot = counts.agg(F.sum("n_docs").cast("double").alias("t"))
    return counts.join(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        F.round(F.col("n_docs") / F.col("t"), 6).alias("actual_share"),
        F.round(F.lit(TARGET_SHARE) * F.col("t") / F.col("n_docs"), 6).alias("weight"),
    )


@query(
    "dedup_canonical_docs",
    COMPONENTS_CTES
    + """,
    comp AS (SELECT node AS doc_id, min(lbl) AS component FROM reach GROUP BY node),
    scored AS (
      SELECT c.component, c.doc_id, d.n_chars,
             row_number() OVER (PARTITION BY c.component
                                ORDER BY d.n_chars DESC, c.doc_id) AS rn,
             count(*) OVER (PARTITION BY c.component) AS cluster_size
      FROM comp c JOIN documents d ON d.doc_id = c.doc_id)
    SELECT component, doc_id AS canonical_doc_id, cluster_size
    FROM scored WHERE rn = 1
    """,
    survey_ref="training: canonical doc per dup cluster",
)
def dedup_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One keeper per near-duplicate cluster: the longest document
    (tie → smallest doc_id). Reuses the clustered components (Jaccard
    pairs ∪ exact-dup star edges → min-label propagation); the canonical
    pick is a per-component window over cluster-cardinality rows. The
    'longest wins' rule is the usual quality proxy when collapsing dups
    into the training set."""
    docs = load_table(spark, sf_dir, "documents")
    jacc = cd.ngram_jaccard_pairs(docs, "text", "doc_id", "source", JACCARD_THRESHOLD).select(
        "id_a", "id_b"
    )
    keeper = F.min("doc_id").over(Window.partitionBy(F.md5("text")))
    exact = docs.select(keeper.alias("id_a"), F.col("doc_id").alias("id_b")).filter(
        F.col("id_a") != F.col("id_b")
    )
    # no .distinct(): connected_components dedupes after symmetrizing —
    # see dedup_components (guide §2.4)
    edges = jacc.union(exact)
    comps = connected_components(edges, src="id_a", dst="id_b").select(
        F.col("node").alias("doc_id"), "component"
    )
    joined = comps.join(docs.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("component").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .withColumn("cluster_size", F.count("*").over(Window.partitionBy("component")))
        .filter(F.col("rn") == 1)
        .select("component", F.col("doc_id").alias("canonical_doc_id"), "cluster_size")
    )


@query(
    "corpus_shard_stats",
    f"""
    SELECT shard, count(*) AS n_docs,
           sum(n_tokens)::bigint AS n_tokens,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM (
      SELECT ('0x' || substr(md5(doc_id::VARCHAR || '{SAMPLE_SALT}'), 1, 8))::BIGINT
               % {N_SHARDS} AS shard,
             doc_id, len(string_split(text, ' ')) AS n_tokens
      FROM documents)
    GROUP BY shard
    """,
    survey_ref="training: hash sharding",
)
def corpus_shard_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-shard assignment + per-shard size accounting —
    the write-side layout check before emitting N training shards. Pure
    projection then one tiny aggregate; shard skew shows up directly in
    the (n_docs, n_tokens) spread."""
    docs = load_table(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(SAMPLE_SALT))), 1, 8), 16, 10)
        .cast("long") % N_SHARDS
    )
    return (
        docs.select(
            shard.alias("shard"),
            "doc_id",
            F.size(F.split("text", " ")).alias("n_tokens"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


@query(
    "corpus_pack_sequences",
    f"""
    SELECT lang, count(*) AS n_docs,
           sum(n_tokens)::bigint AS n_tokens,
           sum(n_seqs)::bigint AS n_seqs,
           round(1.0 - sum(n_tokens)::double / (sum(n_seqs) * {SEQ_LEN}), 6)
             AS padding_frac
    FROM (
      SELECT lang, len(string_split(text, ' ')) AS n_tokens,
             ceil(len(string_split(text, ' ')) / {SEQ_LEN}.0)::bigint AS n_seqs
      FROM documents)
    GROUP BY lang
    """,
    survey_ref="training: sequence packing accounting",
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence budget per language at SEQ_LEN-token context: how many
    sequences each doc yields (ceil, doc-boundary packing) and the padding
    fraction that implies. Exact integer sums; one division at the end.
    The padding_frac is exactly the quantity that tells you whether
    cross-doc packing is worth the shuffle — the cross-doc packer itself
    is operators/packing.py (hierarchical prefix sum; registered as
    bpe_pack_sequences), which eliminates the padding entirely."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    return (
        docs.select(
            "lang",
            n_tok.alias("n_tokens"),
            F.ceil(n_tok / F.lit(float(SEQ_LEN))).cast("long").alias("n_seqs"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum("n_seqs").cast("long").alias("n_seqs"),
            F.round(
                F.lit(1.0) - F.sum("n_tokens").cast("double") / (F.sum("n_seqs") * SEQ_LEN),
                6,
            ).alias("padding_frac"),
        )
    )


@query(
    "events_salted_counts",
    """
    SELECT event_type, count(*) AS n FROM events GROUP BY event_type
    """,
    survey_ref="scale: skew-resistant two-stage aggregation",
)
def events_salted_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted count over the skewed event_type column — result
    identical to the direct groupBy (the oracle), plan spreads each hot
    key over 16 salt partitions before the final key-only aggregate.
    For an algebraic count Spark's map-side partials already handle skew;
    the operator is registered so the driver gate covers the pattern used
    for the non-algebraic cases (collect-like aggs, exact distincts)."""
    from tipoca_stream_spark.operators.skew import salted_count

    events = load_table(spark, sf_dir, "events")
    return salted_count(events, "event_type", n_salts=16)


CHUNK_LEN = 32  # tokens per training chunk
CHUNK_STRIDE = 24  # overlap = CHUNK_LEN - CHUNK_STRIDE


@query(
    "corpus_chunk_windows",
    f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    st AS (SELECT doc_id, w,
                  unnest(generate_series(0, len(w) - 1, {CHUNK_STRIDE})) AS s
           FROM tok)
    SELECT doc_id,
           (s // {CHUNK_STRIDE})::BIGINT AS chunk_idx,
           array_to_string(w[s + 1 : s + {CHUNK_LEN}], ' ') AS chunk_text,
           len(w[s + 1 : s + {CHUNK_LEN}])::BIGINT AS n_tokens
    FROM st
    """,
    survey_ref="training: overlapping token-window chunking",
)
def corpus_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slide a CHUNK_LEN-token window with CHUNK_STRIDE step over each
    document — the standard context-window chunking step before embedding
    or packing. Pure JVM expressions: sequence() generates the window
    starts, posexplode fans them out, slice() cuts each chunk; a narrow
    per-row transform with no shuffle at any scale (output rows ~= tokens
    / stride per doc)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.split("text", " ").alias("w"))
    starts = tok.select(
        "doc_id",
        "w",
        F.posexplode(
            F.sequence(F.lit(0), F.size("w") - 1, F.lit(CHUNK_STRIDE))
        ).alias("chunk_idx", "s"),
    )
    chunk = F.slice(F.col("w"), F.col("s") + 1, CHUNK_LEN)
    return starts.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("long").alias("n_tokens"),
    )


SOURCE_CAP = 20  # max docs retained per source


@query(
    "corpus_source_caps",
    f"""
    WITH scored AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents)
    SELECT doc_id, source, n_chars
    FROM scored WHERE rn <= {SOURCE_CAP}
    """,
    survey_ref="training: per-source document caps (domain-cap pattern)",
)
def corpus_source_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap each source's contribution at SOURCE_CAP docs, keeping the
    longest first (the per-domain cap every web-scale corpus applies so a
    single crawler-friendly site can't dominate the mix). Deterministic
    rank: (n_chars DESC, doc_id). WindowGroupLimit pushes the rn filter
    into a per-partition top-k heap, so only ~cap rows per source ever
    shuffle — the property that makes the cap safe when one domain has a
    billion pages."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        docs.select("doc_id", "source", "n_chars", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= SOURCE_CAP)
        .select("doc_id", "source", "n_chars")
    )


# --- deterministic epoch shuffle order ---------------------------------------

SHUFFLE_SALT = "epoch-1"


@query(
    "corpus_shuffle_order",
    f"""
    SELECT doc_id, shard,
           row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS pos_in_shard
    FROM (
      SELECT doc_id,
             ('0x' || substr(md5(doc_id::VARCHAR || '{SAMPLE_SALT}'), 1, 8))::BIGINT
               % {N_SHARDS} AS shard,
             md5(doc_id::VARCHAR || '-{SHUFFLE_SALT}') AS h
      FROM documents)
    """,
    survey_ref="training: deterministic epoch shuffle (shard + within-shard order)",
)
def corpus_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The epoch-shuffle primitive a trainer consumes: every document's
    (shard, position-in-shard) for one epoch, a pure function of
    (doc_id, epoch salt) — reproducible across runs, engines, and cluster
    sizes, and re-derivable for any epoch by changing the salt (never
    ``rand()``, which is neither reproducible nor resumable). The order
    key is an md5 over the salted id, so within-shard order is
    pseudorandom but stable.

    Scale shape: one projection, then a window PARTITIONED BY SHARD —
    shards are sized for trainer consumption (corpus/N_SHARDS), so no
    task sees more than one shard; there is no global sort anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(SAMPLE_SALT))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % N_SHARDS
    )
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f"-{SHUFFLE_SALT}")))
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        docs.select("doc_id", shard.alias("shard"), h.alias("h"))
        .withColumn("pos_in_shard", F.row_number().over(w).cast("long"))
        .drop("h")
    )
