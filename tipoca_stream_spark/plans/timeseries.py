"""Time-series similarity search (PAPERS.md: EDBT'19 streaming time-series
similarity; EDBT'20 top-k similarity search): per-user hour-of-day activity
profiles compared by cosine similarity against an anchor user.

Exactness trick shared with ``events_zscore_outliers``: profile sums are
integer cents (BIGINT), so both engines aggregate exactly regardless of
summation order; the cosine arithmetic then runs on identical integers and
produces bit-identical doubles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tipoca_stream_spark.plans.registry import query
from tipoca_stream_spark.sources.tables import load_table

SIM_THRESHOLD = 0.5
ANCHOR_SQL = "(SELECT min(user_id) FROM events)"


@query(
    "timeseries_profile_similarity",
    f"""
    WITH prof AS (
      SELECT user_id, date_part('hour', ts) AS h,
             sum(CAST(round(value * 100) AS BIGINT)) AS v
      FROM events GROUP BY user_id, date_part('hour', ts)),
    anchor AS (SELECT h, v FROM prof WHERE user_id = {ANCHOR_SQL}),
    norms AS (SELECT user_id, sqrt(sum(CAST(v AS DOUBLE) * v)) AS nrm FROM prof GROUP BY user_id),
    dots AS (
      SELECT p.user_id, sum(CAST(p.v AS DOUBLE) * a.v) AS dot
      FROM prof p JOIN anchor a USING (h) GROUP BY p.user_id),
    sims AS (
      SELECT d.user_id,
             d.dot / (n.nrm * (SELECT nrm FROM norms WHERE user_id = {ANCHOR_SQL})) AS sim
      FROM dots d JOIN norms n USING (user_id))
    SELECT user_id, round(sim, 6) AS sim
    FROM sims WHERE sim >= {SIM_THRESHOLD} AND user_id <> {ANCHOR_SQL}
    """,
    survey_ref="training: time-series similarity search",
)
def timeseries_profile_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users whose hour-of-day activity profile is cosine-similar to the
    anchor (min user_id). Plan shape: one groupBy builds the profiles
    (shuffle ∝ users×24); the anchor's 24-row profile and the norm table
    are broadcast back — the similarity join never shuffles the profile
    table again. At 100 TB this is the classic profile-embedding search:
    the expensive part is the first aggregate, everything after is
    broadcast-sized."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    prof = (
        ev.groupBy("user_id", F.hour("ts").alias("h"))
        .agg(F.sum(cents).alias("v"))
    ).persist()
    anchor_id = prof.agg(F.min("user_id")).collect()[0][0]
    anchor = prof.filter(F.col("user_id") == anchor_id).select(
        "h", F.col("v").alias("av")
    )
    norms = prof.groupBy("user_id").agg(
        F.sqrt(F.sum(F.col("v").cast("double") * F.col("v"))).alias("nrm")
    )
    anchor_norm = norms.filter(F.col("user_id") == anchor_id).select(
        F.col("nrm").alias("anrm")
    )
    dots = (
        prof.join(F.broadcast(anchor), "h")
        .groupBy("user_id")
        .agg(F.sum(F.col("v").cast("double") * F.col("av")).alias("dot"))
    )
    sims = (
        # norms is users-cardinality — never hint it broadcast (wrong at 1B
        # users); the equi-join on user_id is already the scale-safe plan
        dots.join(norms, "user_id")
        .crossJoin(F.broadcast(anchor_norm))
        .select("user_id", (F.col("dot") / (F.col("nrm") * F.col("anrm"))).alias("sim"))
    )
    return (
        sims.filter((F.col("sim") >= SIM_THRESHOLD) & (F.col("user_id") != anchor_id))
        .select("user_id", F.round("sim", 6).alias("sim"))
    )
