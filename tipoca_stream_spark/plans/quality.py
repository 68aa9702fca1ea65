"""Percentiles, edit-distance near-dup, and outlier detection — quality /
analysis surface on top of the exact-moment machinery."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tipoca_stream_spark.operators import corpus_dedup as cd
from tipoca_stream_spark.plans.registry import query
from tipoca_stream_spark.sources.tables import load_table

LEV_MAX = 3
BOILERPLATE_DF = 0.1  # shingle present in ≥ this fraction of a source's docs


@query(
    "agg_percentiles",
    """
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 6) AS p90,
           round(quantile_cont(o_totalprice, 0.99), 6) AS p99
    FROM orders GROUP BY o_orderstatus
    """,
    survey_ref="§2.5 percentiles",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles — Spark ``percentile`` and DuckDB
    ``quantile_cont`` share the (1-d)·a + d·b definition, so values match
    to the last bit (rounded only as belt-and-braces)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 6).alias("p99"),
    )


@query(
    "agg_approx_percentile",
    """
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 6) AS p50_exact,
           round(quantile_cont(o_totalprice, 0.95), 6) AS p95_exact,
           (approx_quantile(o_totalprice, 0.5)
              BETWEEN quantile_cont(o_totalprice, 0.48)
                  AND quantile_cont(o_totalprice, 0.52))
             AS p50_within_rank_band,
           (approx_quantile(o_totalprice, 0.95)
              BETWEEN quantile_cont(o_totalprice, 0.93)
                  AND quantile_cont(o_totalprice, 0.97))
             AS p95_within_rank_band
    FROM orders GROUP BY o_orderstatus
    """,
    survey_ref="§2.5 approximate percentiles (sketch contract)",
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-percentile surface, checked the same way as
    agg_approx_distinct: the raw sketches differ by engine (Spark =
    Greenwald-Khanna with rank error <= 1/accuracy; DuckDB = t-digest),
    and both guarantee RANK accuracy, not value accuracy — a value-relative
    envelope fails on small groups where adjacent order statistics are far
    apart. So the shared contract is each engine's OWN estimate landing
    between the exact interpolated quantiles at p±0.02 (a ±2% rank band —
    Spark's GK at accuracy=10000 is ~1e-4 rank error, 200x inside). The
    exact quantiles hash-match bit-for-bit as in agg_percentiles."""
    orders = load_table(spark, sf_dir, "orders")

    def pair(p: float, name: str):
        exact = F.percentile("o_totalprice", F.lit(p))
        approx = F.percentile_approx("o_totalprice", F.lit(p), F.lit(10000))
        lo = F.percentile("o_totalprice", F.lit(p - 0.02))
        hi = F.percentile("o_totalprice", F.lit(p + 0.02))
        return [
            F.round(exact, 6).alias(f"{name}_exact"),
            ((approx >= lo) & (approx <= hi)).alias(f"{name}_within_rank_band"),
        ]

    return orders.groupBy("o_orderstatus").agg(
        *(pair(0.5, "p50") + pair(0.95, "p95"))
    )


@query(
    "dedup_levenshtein_pairs",
    f"""
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           levenshtein(a.p_name, b.p_name) AS edit_dist
    FROM part a JOIN part b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= {LEV_MAX}
    """,
    survey_ref="training: edit-distance near-dup",
)
def dedup_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup within a blocking key (p_brand bounds the
    candidate space the way an LSH bucket would at scale); ``levenshtein``
    is a JVM builtin in both engines with the same definition."""
    part = load_table(spark, sf_dir, "part")
    a = part.select(F.col("p_partkey").alias("key_a"), F.col("p_name").alias("name_a"), "p_brand")
    b = part.select(F.col("p_partkey").alias("key_b"), F.col("p_name").alias("name_b"), "p_brand")
    return (
        a.join(b, "p_brand")
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b", F.levenshtein("name_a", "name_b").alias("edit_dist"))
        .filter(F.col("edit_dist") <= LEV_MAX)
    )


@query(
    "events_zscore_outliers",
    """
    WITH m AS (
      SELECT event_type,
             count(*) AS n,
             sum(CAST(round(value * 100) AS BIGINT)::DECIMAL(20,0)) AS sx,
             sum((CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT))::DECIMAL(38,0)) AS sxx
      FROM events GROUP BY event_type),
    stats AS (
      SELECT event_type, n,
             CAST(sx AS DOUBLE) / n / 100 AS mean_v,
             sqrt(((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1)) / 10000) AS std_v
      FROM m)
    SELECT e.event_id, e.event_type, round((e.value - s.mean_v) / s.std_v, 6) AS zscore
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE abs((e.value - s.mean_v) / s.std_v) > 3
    """,
    survey_ref="training: quality/outlier scoring",
)
def events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outliers from exact integer-cent moments; the
    stats side is tiny and broadcast back onto the stream."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    m = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(cents.cast("decimal(20,0)")).alias("sx"),
        F.sum((cents * cents).cast("decimal(38,0)")).alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx").cast("double"), F.col("sxx").cast("double")
    # try_divide twice: a single-row group has n-1 = 0, and a constant
    # group has std 0 — DuckDB's double division by zero yields NULL in
    # both spots (the NULL z never passes the |z| > 3 gate), ANSI Spark
    # raises; NULL matches the oracle exactly
    stats = m.select(
        "event_type",
        (sx / n / 100).alias("mean_v"),
        F.sqrt(F.try_divide(sxx - sx * sx / n, n - 1) / 10000).alias("std_v"),
    )
    z = F.try_divide(F.col("value") - F.col("mean_v"), F.col("std_v"))
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 3)
        .select("event_id", "event_type", F.round(z, 6).alias("zscore"))
    )


@query(
    "text_boilerplate_shingles",
    f"""
    WITH words AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
    sh AS (SELECT DISTINCT doc_id, source, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
           FROM words, unnest(range(1, len(w) - 1)) AS t(i)),
    per_src AS (SELECT source, count(DISTINCT doc_id) AS n_docs FROM documents GROUP BY source),
    df AS (SELECT source, shingle, count(*) AS n FROM sh GROUP BY source, shingle)
    SELECT df.source, df.shingle, round(df.n::double / per_src.n_docs, 6) AS doc_frac
    FROM df JOIN per_src USING (source)
    WHERE df.n::double / per_src.n_docs >= {BOILERPLATE_DF}
    """,
    survey_ref="training: boilerplate detection",
)
def text_boilerplate_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection: 3-gram shingles occurring in ≥10% of a
    source's documents (the detect half of boilerplate removal — the strip
    half is an anti-join of this set against the shingle stream). Document
    frequency is a distinct-per-doc count, so repeated shingles inside one
    doc don't inflate it; per-source doc counts are a tiny broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    sh = (
        cd.word_shingles(docs, "text", "doc_id", n=3)
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("doc_id", "source", "shingle")
        .distinct()
    )
    per_src = docs.groupBy("source").agg(F.count_distinct("doc_id").alias("n_docs"))
    dfreq = sh.groupBy("source", "shingle").agg(F.count("*").alias("n"))
    frac = F.col("n").cast("double") / F.col("n_docs")
    return (
        dfreq.join(F.broadcast(per_src), "source")
        .filter(frac >= BOILERPLATE_DF)
        .select("source", "shingle", F.round(frac, 6).alias("doc_frac"))
    )


DUP_L = 5  # duplicated-window width (words)


def dup_spans(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Maximal cross-document duplicated spans (see text_dup_spans for
    semantics) over any (id, text) frame — the reusable operator behind
    the registered query; also driven by the Python-oracle property test
    (tests/test_dup_spans_property.py)."""
    from pyspark.sql.window import Window

    words = docs.select(F.col(id_col).alias("doc_id"), F.split(text_col, " ").alias("w"))
    grams_arr = F.expr(
        f"CASE WHEN size(w) >= {DUP_L} THEN"
        f" transform(sequence(1, size(w) - {DUP_L - 1}),"
        f" i -> concat_ws(' ', slice(w, i, {DUP_L})))"
        f" ELSE array() END"
    )
    g = words.select(
        "doc_id", F.posexplode(grams_arr).alias("pos0", "gram")
    ).select(
        "doc_id", (F.col("pos0") + 1).cast("bigint").alias("pos"), "gram"
    )
    dup = (
        g.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("gram")
    )
    hit = g.join(dup, "gram", "left_semi").select(
        "doc_id", "pos", (F.col("pos") + DUP_L - 1).alias("e")
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flag = (
        F.col("pos") > F.coalesce(F.max("e").over(w_prev), F.lit(-1)) + 1
    ).cast("int")
    w_run = Window.partitionBy("doc_id").orderBy("pos")
    isl = hit.withColumn("flag", flag).withColumn(
        "island", F.sum("flag").over(w_run)
    )
    return isl.groupBy("doc_id", "island").agg(
        F.min("pos").alias("span_start"),
        F.max("e").alias("span_end"),
        (F.max("e") - F.min("pos") + 1).alias("span_words"),
        F.count("*").alias("n_windows"),
    ).drop("island")


@query(
    "text_dup_spans",
    f"""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
                 w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS gram
          FROM words, unnest(range(1, len(w) - {DUP_L - 2})) AS t(i)),
    dup AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
    hit AS (SELECT doc_id, pos, pos + {DUP_L - 1} AS e FROM g
            WHERE gram IN (SELECT gram FROM dup)),
    isl AS (SELECT doc_id, pos, e,
                   CASE WHEN pos > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
                        THEN 1 ELSE 0 END AS flag
            FROM hit),
    isl2 AS (SELECT doc_id, pos, e,
                    sum(flag) OVER (PARTITION BY doc_id ORDER BY pos) AS island
             FROM isl)
    SELECT doc_id,
           min(pos) AS span_start,
           max(e) AS span_end,
           max(e) - min(pos) + 1 AS span_words,
           count(*) AS n_windows
    FROM isl2 GROUP BY doc_id, island
    """,
    survey_ref="training: duplicated-span detection (substring-level dedup)",
)
def text_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated spans per document: every {DUP_L}-word window
    shared verbatim with another document, with overlapping/adjacent hit
    windows merged into spans via gaps-and-islands (running-max window +
    cumulative island ids). This is the span-level half of exact dedup —
    doc-level dedup (dedup_exact) drops whole copies, this locates the
    copied REGIONS inside otherwise-distinct docs (the shape of
    suffix-array training-data dedup, re-expressed as n-gram windows so
    it is one groupBy + one semi-join + two window passes instead of a
    sequential suffix sort). Scale: the gram shuffle is the cost, keyed
    on the gram text exactly like boilerplate detection; the window
    passes run per-doc after a doc-keyed shuffle. No step is
    driver-side and nothing is quadratic in corpus size."""
    return dup_spans(load_table(spark, sf_dir, "documents"))


@query(
    "mask_scrub_digits",
    """
    SELECT c_custkey,
           regexp_replace(c_name, '[0-9]+', '<id>', 'g') AS scrubbed_name,
           length(regexp_replace(c_name, '[^0-9]', '', 'g')) AS n_digits
    FROM customer
    """,
    survey_ref="P5-family corpus scrub (regex redaction)",
)
def mask_scrub_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex redaction as a corpus-cleaning op (the training-data sibling of
    the P5 masking hash): digit runs replaced with a placeholder, plus a
    digit-count audit column. Pure codegen'd expressions — the pattern is
    deliberately in the Java∩RE2 common dialect so both engines agree."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_replace("c_name", "[0-9]+", "<id>").alias("scrubbed_name"),
        F.length(F.regexp_replace("c_name", "[^0-9]", "")).alias("n_digits"),
    )


# --- Naive-Bayes quality classifier filter -----------------------------------

_NB_ORACLE = """
    WITH words AS (
      SELECT doc_id, lang, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      FROM documents
    ),
    train AS (SELECT * FROM words WHERE lang IS NOT NULL),
    counts AS (
      SELECT w,
             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::DOUBLE AS cpos,
             sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END)::DOUBLE AS cneg
      FROM train GROUP BY w
    ),
    tot AS (
      SELECT sum(cpos) AS tpos, sum(cneg) AS tneg, count(*)::DOUBLE AS v
      FROM counts
    ),
    lr AS (
      SELECT w, ln((cpos + 1) / (tpos + v)) - ln((cneg + 1) / (tneg + v)) AS lr
      FROM counts CROSS JOIN tot
    ),
    prior AS (
      SELECT ln((sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) + 1.0)
               / (sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) + 1.0)) AS prior
      FROM documents WHERE lang IS NOT NULL
    )
    SELECT doc_id,
           count(*)::BIGINT AS n_scored,
           round(sum(lr) + any_value(prior), 6) AS nb_logodds,
           round(sum(lr) + any_value(prior), 6) > 0 AS pass_nb
    FROM words JOIN lr USING (w) CROSS JOIN prior
    GROUP BY doc_id
    """


@query(
    "text_nb_quality_filter",
    _NB_ORACLE,
    survey_ref="training: Naive-Bayes quality classifier filter (CCNet/DCLM shape)",
)
def text_nb_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive-Bayes document filter — the classifier-based
    quality gate LLM curation pipelines run after the heuristic gates
    (GPT-3's Wikipedia-vs-CommonCrawl NB, CCNet's linear filter, DCLM's
    fastText stage all share this shape: train token log-odds on a
    labeled seed, score every document, keep score > 0). The seed here
    is the ``lang`` column ('en' vs the rest); the operator is the same
    whatever the label source. Add-1 smoothing over the joint vocabulary;
    tokens outside the training vocabulary are skipped (inner join).

    Scale shape: training is ONE explode→groupBy over the seed (token
    counts per class, map-side combinable); scoring joins the token
    stream against the per-token log-ratio table keyed on the token —
    vocabulary-sized, broadcast for real tokenizers — then one per-doc
    aggregate. The pass flag thresholds the ROUNDED score so both
    engines decide ties identically."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        "lang",
        F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("w"),
    )
    train = words.filter(F.col("lang").isNotNull())
    pos = F.when(F.col("lang") == "en", 1).otherwise(0)
    neg = F.when(F.col("lang") != "en", 1).otherwise(0)
    counts = train.groupBy("w").agg(
        F.sum(pos).cast("double").alias("cpos"),
        F.sum(neg).cast("double").alias("cneg"),
    )
    tot = counts.agg(
        F.sum("cpos").alias("tpos"),
        F.sum("cneg").alias("tneg"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    lr = counts.crossJoin(F.broadcast(tot)).select(
        "w",
        (
            F.log((F.col("cpos") + 1) / (F.col("tpos") + F.col("v")))
            - F.log((F.col("cneg") + 1) / (F.col("tneg") + F.col("v")))
        ).alias("lr"),
    )
    prior = docs.filter(F.col("lang").isNotNull()).agg(
        F.log(
            (F.sum(pos) + F.lit(1.0)) / (F.sum(neg) + F.lit(1.0))
        ).alias("prior")
    )
    score = F.round(F.sum("lr") + F.any_value("prior"), 6)
    return (
        words.join(F.broadcast(lr), "w")
        .crossJoin(F.broadcast(prior))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_scored"),
            score.alias("nb_logodds"),
            (score > 0).alias("pass_nb"),
        )
    )


# --- per-source score calibration ---------------------------------------------

_CALIBRATION_ORACLE = (
    """
    WITH nb AS (SELECT doc_id, nb_logodds FROM ("""
    + _NB_ORACLE
    + """) ),
    scored AS (
      SELECT d.source, nb.nb_logodds AS s
      FROM nb JOIN documents d USING (doc_id)
    ),
    cuts AS (
      SELECT source,
             quantile_cont(s, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs
      FROM scored GROUP BY source
    )
    SELECT scored.source,
           (1 + len(list_filter(qs, q -> s > q)))::INTEGER AS decile,
           count(*)::BIGINT AS n_docs,
           round(min(s), 6) AS lo_score,
           round(max(s), 6) AS hi_score
    FROM scored JOIN cuts USING (source)
    GROUP BY scored.source, 2
    """
)


@query(
    "quality_calibration_by_source",
    _CALIBRATION_ORACLE,
    survey_ref="training: per-source classifier-score calibration (decile cutoffs)",
)
def quality_calibration_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE calibration of the classifier score: a raw quality
    score is not comparable across domains (a forum and an encyclopedia
    have different score distributions), so pipelines bucket each
    document against its OWN source's quantiles before thresholding.
    Reports each (source, decile) cell with its count and score range;
    deciles come from exact per-source quantile CUTOFFS — one
    source-keyed aggregate producing a 9-value array per source, then a
    broadcast join and an array comparison; no per-source global window,
    no corpus-wide sort. Both engines compute identical interpolated
    cutoffs over the ROUNDED scores, and assignment uses strict >, so
    ties land identically."""
    docs = load_table(spark, sf_dir, "documents")
    nb = text_nb_quality_filter(spark, sf_dir).select("doc_id", "nb_logodds")
    scored = nb.join(docs.select("doc_id", "source"), "doc_id").select(
        "source", F.col("nb_logodds").alias("s")
    )
    cuts = scored.groupBy("source").agg(
        F.percentile(
            "s", F.array(*[F.lit(i / 10.0) for i in range(1, 10)])
        ).alias("qs")
    )
    decile = (
        F.size(F.filter("qs", lambda q: F.col("s") > q)) + 1
    ).cast("int")
    return (
        scored.join(F.broadcast(cuts), "source")
        .groupBy("source", decile.alias("decile"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.min("s"), 6).alias("lo_score"),
            F.round(F.max("s"), 6).alias("hi_score"),
        )
    )


# --- benchmark-contamination screen (round 12) --------------------------------

CONTAM_N = 4  # word n-gram width; 4 gives real overlap structure at test SF


def _contam_parts() -> str:
    return "||' '||".join(f"w[i+{j}]" for j in range(CONTAM_N))


@query(
    "corpus_contamination_screen",
    f"""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (SELECT doc_id, {_contam_parts()} AS s
           FROM words, unnest(range(1, len(w) - {CONTAM_N - 2})) AS t(i)),
    tr AS (SELECT DISTINCT doc_id, s FROM sh WHERE doc_id % 20 <> 0),
    te AS (SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0),
    tot AS (SELECT doc_id, count(*) AS total_ngrams FROM tr GROUP BY doc_id),
    shr AS (SELECT doc_id, count(*) AS shared_ngrams
            FROM tr JOIN te USING (s) GROUP BY doc_id)
    SELECT shr.doc_id, shared_ngrams, total_ngrams,
           round(shared_ngrams / total_ngrams::double, 6) AS contamination
    FROM shr JOIN tot USING (doc_id)
    """,
    survey_ref="training: benchmark decontamination (n-gram overlap screen)",
)
def corpus_contamination_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination pass: documents with doc_id % 20 == 0 stand in
    for the held-out benchmark suite; every other document is scored by
    the fraction of its distinct word {CONTAM_N}-grams that appear
    anywhere in the benchmark side (GPT-3's 13-gram dedup / PaLM's
    contamination analysis, public literature — n is a knob). 100 TB
    shape: the benchmark shingle set is tiny and BROADCAST, so the
    corpus side streams through the join with no train-side shuffle;
    the only shuffles are doc_id-keyed aggregates."""
    from tipoca_stream_spark.operators.contamination import contamination_screen

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 20 != 0)
    test = docs.filter(F.col("doc_id") % 20 == 0)
    return contamination_screen(train, test, n=CONTAM_N)


# --- quality-aware dedup + novelty (round 13) ---------------------------------

_FP_SQL = (
    "md5(array_to_string(list_sort(list_distinct("
    "string_split(lower(text), ' '))), ' '))"
)


@query(
    "dedup_keep_best_quality",
    f"""
    WITH base AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
    fp AS (SELECT doc_id, {_FP_SQL} AS fingerprint FROM base),
    q AS (SELECT doc_id,
                 len(string_split(text, ' '))::bigint AS n_tokens,
                 len(list_distinct(string_split(text, ' ')))::double
                   / len(string_split(text, ' ')) AS distinct_ratio
          FROM base),
    j AS (SELECT fp.doc_id, fingerprint, n_tokens, distinct_ratio
          FROM fp JOIN q USING (doc_id)),
    r AS (SELECT *,
                 row_number() OVER (PARTITION BY fingerprint
                                    ORDER BY distinct_ratio DESC,
                                             n_tokens DESC, doc_id) AS rn,
                 count(*) OVER (PARTITION BY fingerprint) AS nm
          FROM j)
    SELECT doc_id, fingerprint, nm::bigint AS n_members, n_tokens,
           distinct_ratio
    FROM r WHERE rn = 1
    """,
    survey_ref="training: quality-aware dedup (keep best rendition per group)",
)
def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware exact dedup: per word-set-fingerprint group keep the
    HIGHEST-QUALITY rendition (distinct_ratio DESC, n_tokens DESC, id ASC)
    instead of the smallest id — the curation rule for crawls holding
    truncated copies / boilerplate-padded mirrors of the same page. One
    fingerprint-keyed window over group-local rows; no self-join; output
    is O(groups) (operators/corpus_dedup.keep_best_quality)."""
    docs = load_table(spark, sf_dir, "documents")
    return cd.keep_best_quality(docs, "text", "doc_id")


@query(
    "text_ngram_novelty",
    """
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
                   FROM documents WHERE text IS NOT NULL),
    sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
           FROM words, unnest(range(1, len(w) - 1)) AS t(i)),
    f AS (SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY s),
    per AS (SELECT sh.doc_id,
                   count(*) AS n_shingles,
                   sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)
                     AS n_novel
            FROM sh JOIN f USING (s) GROUP BY sh.doc_id)
    SELECT doc_id, n_shingles::bigint AS n_shingles,
           n_novel::bigint AS n_novel,
           round(n_novel / n_shingles::double, 6) AS novelty
    FROM per
    """,
    survey_ref="training: per-doc n-gram novelty (diversity weighting)",
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 3-gram novelty: the fraction of a doc's distinct shingles
    globally FIRST seen in it (smallest containing doc_id) — the soft
    counterpart of near-dup removal, usable as a sampling weight. One
    shingle-keyed aggregate + one doc-keyed aggregate; no self-join
    (operators/text.ngram_novelty)."""
    docs = load_table(spark, sf_dir, "documents")
    from tipoca_stream_spark.operators.text import ngram_novelty

    return ngram_novelty(docs, "text", "doc_id", n=3)


@query(
    "corpus_dedup_rate_by_source",
    f"""
    WITH fp AS (SELECT doc_id, source, {_FP_SQL} AS f
                FROM documents
                WHERE text IS NOT NULL AND source IS NOT NULL)
    SELECT source,
           count(*)::bigint AS n_docs,
           count(DISTINCT f)::bigint AS n_distinct,
           round(1 - count(DISTINCT f) / count(*)::double, 6) AS dup_rate
    FROM fp GROUP BY source
    """,
    survey_ref="training: per-source duplication-rate telemetry",
)
def corpus_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication-rate telemetry per source — the number a curation run
    reports before deciding which crawl snapshots to drop: docs, distinct
    word-set fingerprints, and the dup rate. One source-keyed aggregate
    with a distinct count; map-side combinable."""
    from tipoca_stream_spark.operators.text import fingerprint

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("source").isNotNull()
    )
    fp = fingerprint(docs, "text", "doc_id").join(
        docs.select("doc_id", "source"), "doc_id"
    )
    return fp.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("fingerprint").cast("long").alias("n_distinct"),
        F.round(
            F.lit(1)
            - F.countDistinct("fingerprint").cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("dup_rate"),
    )


@query(
    "corpus_cluster_weights",
    f"""
    WITH fp AS (SELECT doc_id, {_FP_SQL} AS f
                FROM documents WHERE text IS NOT NULL),
    sz AS (SELECT f, count(*) AS n FROM fp GROUP BY f)
    SELECT fp.doc_id, sz.n::bigint AS cluster_size,
           round(1.0 / sz.n, 6) AS weight
    FROM fp JOIN sz USING (f)
    """,
    survey_ref="training: inverse-duplication sampling weights",
)
def corpus_cluster_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-duplication sampling weights: each doc weighted 1/size of
    its exact-dup (word-set fingerprint) group, so a page crawled 29
    times contributes ~one page of probability mass instead of 29 — the
    soft alternative to dropping duplicates outright (keeps rare
    renditions reachable), pairing with text_ngram_novelty on the
    near-dup side. One fingerprint-keyed aggregate + a keyed join back;
    no window over the corpus, no self-join."""
    from tipoca_stream_spark.operators.text import fingerprint

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    fp = fingerprint(docs, "text", "doc_id")
    sz = fp.groupBy("fingerprint").agg(F.count(F.lit(1)).cast("long").alias("cluster_size"))
    return fp.join(sz, "fingerprint").select(
        "doc_id",
        "cluster_size",
        F.round(F.lit(1.0) / F.col("cluster_size"), 6).alias("weight"),
    )
