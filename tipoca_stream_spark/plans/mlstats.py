"""Statistical / ML-adjacent analytics: frequent items, correlation,
closed-form regression, robust (MAD) anomaly flags.

The reference's generated SQL stops at counts and sums
(`pkg/redshiftloader/redshift.go` merge aggregates); these are
training-data-pipeline extensions — vocabulary caps and hot-key discovery
(heavy hitters), feature sanity checks (correlation matrix), drift probes
(per-group regression), and robust outlier gating for noisy telemetry
columns (median/MAD beats mean/stddev when the column itself is
heavy-tailed). All exact, all with DuckDB oracles; doubles are rounded to
the repo-wide 6 dp (4 dp for ratios of derived medians) so summation-order
float noise cannot break the driver's value-hash compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tipoca_stream_spark.operators.heavyhitters import heavy_hitters
from tipoca_stream_spark.plans.registry import query
from tipoca_stream_spark.sources.tables import load_table

HH_K = 200  # frequency threshold denominator: report items with cnt > n/k


@query(
    "agg_heavy_hitters",
    f"""
    WITH it AS (
      SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS item
      FROM lineitem WHERE l_extendedprice IS NOT NULL)
    SELECT item, count(*) AS cnt FROM it GROUP BY item
    HAVING count(*) > (SELECT count(*) FROM it) / {HH_K}.0
    """,
    survey_ref="training: frequent items / hot-key discovery (exact, candidate-pruned)",
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-bucket heavy hitters: buckets holding > 1/200 of all
    lineitems. The oracle runs the naive GROUP BY + HAVING; the Spark
    plan (operators/heavyhitters.py) prunes to per-partition-frequent
    candidates in a no-shuffle Arrow pass first, so at 100 TB the
    exchange carries candidate items only, not the billion-item tail.
    Same answer, scale-proof shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.floor(F.col("l_extendedprice") / 5000).cast("bigint").alias("item")
    )
    return heavy_hitters(items, "item", k=HH_K)


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_CORR_PAIRS = [
    (a, b) for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1 :]
]


@query(
    "agg_corr_matrix",
    "\nUNION ALL\n".join(
        f"SELECT '{a}' AS col_x, '{b}' AS col_y,"
        f" round(corr({a}, {b}), 6) AS corr_xy FROM lineitem"
        for a, b in _CORR_PAIRS
    ),
    survey_ref="training: feature correlation matrix (single-pass pairwise Pearson)",
)
def agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations of the lineitem measures, all six
    pairs in ONE aggregate pass (one scan, one 1-row partial-agg
    exchange — adding columns widens the row, never adds passes), then
    unpivoted JVM-side with stack(). The 100 TB cost is the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        *[
            F.round(F.corr(a, b), 6).alias(f"c_{i}")
            for i, (a, b) in enumerate(_CORR_PAIRS)
        ]
    )
    stack_args = ", ".join(
        f"'{a}', '{b}', c_{i}" for i, (a, b) in enumerate(_CORR_PAIRS)
    )
    return row.selectExpr(
        f"stack({len(_CORR_PAIRS)}, {stack_args}) AS (col_x, col_y, corr_xy)"
    )


@query(
    "ml_linreg_by_group",
    """
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    survey_ref="training: closed-form per-group linear regression (drift probe)",
)
def ml_linreg_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares fit of extendedprice ~ quantity per returnflag via
    the SQL-standard regr_* aggregates (Spark >= 3.4 computes them
    JVM-side with map-side partial aggregation — a k-group shuffle of
    moment tuples, nothing iterative). Closed form beats gradient
    descent wherever one pass over the moments suffices."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 6).alias(
            "intercept"
        ),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.count("*").alias("n"),
    )


@query(
    "events_anomaly_mad",
    """
    WITH med AS (
      SELECT event_type, median(value) AS med FROM events GROUP BY event_type),
    thr AS (
      SELECT e.event_type, m.med AS med,
             median(abs(e.value - m.med)) AS mad
      FROM events e JOIN med m USING (event_type)
      GROUP BY e.event_type, m.med)
    SELECT e.event_id, e.event_type, e.value,
           round(abs(e.value - t.med) / t.mad, 4) AS dev_ratio
    FROM events e JOIN thr t USING (event_type)
    WHERE t.mad > 0 AND abs(e.value - t.med) > 4.4478 * t.mad
    """,
    survey_ref="training: robust outlier flags (median/MAD, exact)",
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value sits > 3 robust z-scores (3 x 1.4826 = 4.4478
    MADs) from their type's median. Median/MAD resists the outliers it
    hunts (mean/stddev gets dragged by them). Two exact-median group
    passes over a 5-type key, then the per-type thresholds broadcast
    back onto the scan — the full-table cost is two shuffles keyed on a
    tiny key plus one broadcast-joined scan. The 4.4478 literal is
    spelled identically in both engines so the float threshold is
    bit-identical."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    thr = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(F.median(F.abs(F.col("value") - F.col("med"))).alias("mad"))
    )
    dev = F.abs(F.col("value") - F.col("med"))
    return (
        ev.join(F.broadcast(thr), "event_type")
        .where((F.col("mad") > 0) & (dev > F.lit(4.4478) * F.col("mad")))
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(dev / F.col("mad"), 4).alias("dev_ratio"),
        )
    )


@query(
    "agg_hll_sketch_rollup",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           count(DISTINCT CAST(ts AS DATE)) AS n_days,
           TRUE AS merged_within_5pct
    FROM events GROUP BY event_type
    """,
    survey_ref="A3-family: re-aggregatable distinct sketches (HLL union rollup)",
)
def agg_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-aggregation pattern exact distinct counts cannot do:
    per-(type, day) HLL sketches (Datasketches, lgK=14 → ~0.8% rel
    error) UNION-merged into per-type totals — at 100 TB the daily
    sketch table is what you persist, and any rollup (weekly, all-time,
    cross-type) is a merge of kilobyte sketches, never a re-scan.
    Cross-engine contract in the agg_approx_distinct style: DuckDB has
    no Datasketches, so the oracle pins the exact counts and day
    cardinality and asserts the merged estimate lands within 5% of
    exact (~6 sigma at lgK=14 — a sketch-plumbing bug, not noise, is
    the only way to miss). Estimate bias of a merged union equals the
    direct sketch's on the same key set: the union is lossless over
    HLL registers."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", 14).alias("sk")
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        # count("day"), not count(*): a NULL-ts group contributes one
        # NULL-day sketch row but zero days (matches the oracle's
        # count(DISTINCT CAST(ts AS DATE)), which skips NULLs)
        F.count("day").alias("n_days"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    # eqNullSafe: GROUP BY keeps a NULL event_type group in both frames,
    # and a plain equi-join would drop it (SQL NULL = NULL)
    return merged.join(
        exact, merged["event_type"].eqNullSafe(exact["event_type"])
    ).select(
        merged["event_type"].alias("event_type"),
        "exact_users",
        "n_days",
        (
            F.abs(F.col("est") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("merged_within_5pct"),
    )
