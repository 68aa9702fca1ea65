"""SCD2 history materialization from a CDC changelog.

The reference keeps only the latest row per PK (DeDupe latest-wins →
merge, load_processor.go:604-667). The other standard materialization of
the same changelog is the full type-2 history: every version becomes a
validity interval [valid_from, valid_to), deletes close the open interval
without emitting a row. This operator produces that view with one window
pass — no self-joins, no iteration:

- sort each key's changes by (ts, seq) — seq disambiguates equal
  timestamps the way kafkaoffset orders the reference's events;
- ``valid_to`` = the next change's ts (``lead``), NULL while open;
- delete rows vanish after donating their ts as the previous version's
  ``valid_to``.

Scale: a single shuffle on the key (window partition), state per row is
one ``lead`` — the same cost envelope as latest-wins dedupe, so anywhere
the CDC merge runs, the history variant runs too.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    changelog: DataFrame,
    key_col: str,
    ts_col: str,
    op_col: str,
    value_cols: list[str],
    delete_op: str = "d",
    seq_col: str | None = None,
) -> DataFrame:
    """Materialize type-2 history: one row per non-delete version with
    ``valid_from``/``valid_to`` (NULL = currently valid)."""
    order = [F.col(ts_col).asc()] + ([F.col(seq_col).asc()] if seq_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    with_next = changelog.withColumn("_next_ts", F.lead(ts_col).over(w))
    return (
        with_next.filter(F.col(op_col) != delete_op)
        .select(
            key_col,
            *value_cols,
            F.col(ts_col).alias("valid_from"),
            F.col("_next_ts").alias("valid_to"),
        )
    )


def current_rows() -> Column:
    """Filter predicate selecting the open (currently-valid) versions —
    composing ``scd2_history`` with this must equal latest-wins dedupe
    minus deleted keys (pinned by tests)."""
    return F.col("valid_to").isNull()
