"""As-of (temporal) join — an operator Spark lacks natively, composed from
built-ins (SURVEY.md's "custom operators" guidance: composition first).

``asof_join(left, right, by, ...)`` attaches to every left row the most
recent right row with ``right.ts <= left.ts`` within the same ``by`` group
(backward direction, inclusive — the common market-data/CDC enrichment
shape; DuckDB/pandas ``ASOF JOIN`` semantics).

Composition: tag both sides, union, and run ``last(value, ignorenulls)``
over a (by, ts) window — one shuffle on the group key, no range explosion.
A join-based alternative (inequality join + max) would force a range join;
the window form keeps it a single sort-based pass, which is also the
scale-correct plan: shuffle ∝ input rows, memory ∝ one group's window
frame (a running last, O(1)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward inclusive as-of join; right payload columns arrive suffixed,
    NULL when no right row precedes the left row in its group."""
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in by and c != right_ts]

    r_tag = right.select(
        *by,
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_right"),
        F.struct(*[F.col(c) for c in right_payload]).alias("_rp"),
    )
    l_tag = left.select(
        *by,
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_is_right"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_left"),
    )
    # give each side the other's payload column as a typed NULL so the
    # union lines up
    r_tag = r_tag.withColumn("_left", F.lit(None).cast(l_tag.schema["_left"].dataType))
    l_tag = l_tag.withColumn("_rp", F.lit(None).cast(r_tag.schema["_rp"].dataType))

    unioned = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal _ts → inclusive (<=) match
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("_ts"), F.col("_is_right").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_match = unioned.withColumn("_match", F.last("_rp", ignorenulls=True).over(w))
    out = with_match.filter(F.col("_is_right") == 0)
    left_cols = [F.col(f"_left.{c}").alias(c) for c in left.columns]
    match_cols = [F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in right_payload]
    return out.select(*left_cols, *match_cols)
