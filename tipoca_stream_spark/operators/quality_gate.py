"""Data-quality gate: declarative constraint checks over a table.

The reference delegates integrity to Redshift (PKs declared in DDL,
redshift.go:147-163 — though Redshift does not enforce them either); a
Spark-side engine has to check constraints itself before publishing a
batch. The gate evaluates:

- row-level rules (NOT NULL, range, set membership, custom predicates) —
  ALL in a single scan: each rule compiles to ``sum(case when violated)``
  in one aggregate projection, so adding rules adds no passes;
- key-level rules (PK uniqueness) — one keyed aggregate counting
  over-occupied keys.

Output is a tiny (rule, n_violations) table — feed it to the supervisor
to block a release (the same hook the mask-diff reload uses) or export it
via the usage exporter.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> tuple[str, Column]:
    return (f"{col}_not_null", F.col(col).isNull())


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    """Violated when outside [lo, hi) (NULLs are not range violations —
    pair with ``not_null`` to reject them)."""
    c = F.col(col)
    return (f"{col}_in_range", c.isNotNull() & ((c < lo) | (c >= hi)))


def in_set(col: str, allowed: Sequence) -> tuple[str, Column]:
    c = F.col(col)
    return (f"{col}_in_set", c.isNotNull() & ~c.isin(list(allowed)))


def violation_counts(
    df: DataFrame,
    rules: Sequence[tuple[str, Column]],
    unique_keys: Sequence[str] | None = None,
) -> DataFrame:
    """(rule, n_violations) for every rule; row-level rules share one scan.
    ``unique_keys`` adds a ``pk_unique`` rule counting rows beyond the
    first per key (so n == extra rows, 0 when the key is unique)."""
    aggs = [
        F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(name)
        for name, pred in rules
    ]
    long = None
    if aggs:
        counts = df.agg(*aggs)
        # unpivot the 1-row aggregate with stack(): the fact is scanned
        # ONCE for all row-level rules (a union of per-rule selects would
        # re-execute the aggregate per rule)
        stack_args = ", ".join(f"'{name}', {name}" for name, _ in rules)
        long = counts.select(
            F.expr(f"stack({len(rules)}, {stack_args}) AS (rule, n_violations)")
        )
    if unique_keys:
        dup = (
            df.groupBy(*unique_keys)
            .agg(F.count("*").alias("_c"))
            .agg(
                F.lit("pk_unique").alias("rule"),
                F.coalesce(F.sum(F.col("_c") - 1), F.lit(0)).cast("long").alias("n_violations"),
            )
        )
        long = dup if long is None else long.unionByName(dup)
    return long


def assert_clean(df: DataFrame, rules, unique_keys=None) -> None:
    """Raise if any rule is violated — the release-blocking form."""
    bad = violation_counts(df, rules, unique_keys).filter(F.col("n_violations") > 0).collect()
    if bad:
        detail = ", ".join(f"{r['rule']}={r['n_violations']}" for r in bad)
        raise ValueError(f"quality gate failed: {detail}")


def fk_violations(
    df: DataFrame, col: str, dim: DataFrame, dim_col: str
) -> DataFrame:
    """(rule, n_violations) for referential integrity: non-NULL fact keys
    with no match in the dimension. A left-anti join on the key — at scale
    the dimension's distinct-key projection is what joins (broadcast when
    small, keyed shuffle otherwise); NULL keys are `not_null`'s job."""
    keys = dim.select(F.col(dim_col).alias(col)).distinct()
    return (
        df.filter(F.col(col).isNotNull())
        .join(keys, col, "left_anti")
        .agg(
            F.lit(f"{col}_fk").alias("rule"),
            F.count("*").cast("long").alias("n_violations"),
        )
    )
