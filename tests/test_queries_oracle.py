"""Mirror of the driver's correctness gate: run every ``queries()`` entry on
Spark and its ``oracle_sql()`` on DuckDB over the same parquet, compare
row count + column names + order-insensitive values.

Runs at sf0.001 for speed (the driver uses sf0.01; test_oracle_sf001
semantics are identical, just smaller).
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod
from tipoca_stream_spark.plans import QUERIES


@pytest.fixture(scope="module")
def ducksql(sf_dir):
    import os

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        # driver testdata = one flat file per table; self-generated scale
        # datasets (scripts/make_scale_dataset.py) = a directory of parts
        path = f"{sf_dir}/{t}.parquet"
        pattern = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pattern}')")
    return con


def normalize(rows, columns):
    out = []
    for row in rows:
        vals = []
        for c in columns:
            v = row[c] if not isinstance(row, tuple) else row[columns.index(c)]
            if isinstance(v, float):
                v = round(v, 6) if math.isfinite(v) else v
            if hasattr(v, "as_integer_ratio") and not isinstance(v, (int, float)):
                v = float(v)  # Decimal
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, ducksql, name):
    qdef = QUERIES[name]
    sdf = qdef.fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = sdf.collect()

    if qdef.oracle is None:
        assert len(spark_rows) >= 0  # rows-only check, like the driver's
        return

    rel = ducksql.sql(qdef.oracle)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count {len(spark_rows)} != {len(duck_rows)}"

    cols = sorted(spark_cols)
    s_n = normalize([r.asDict() for r in spark_rows], cols)
    d_map = [dict(zip(duck_cols, r)) for r in duck_rows]
    d_n = normalize(d_map, cols)
    mismatches = [(a, b) for a, b in zip(s_n, d_n) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"

    # strict pandas-path compare: the driver may consume both sides via
    # arrow/pandas, where type divergence (e.g. DuckDB HUGEINT → float)
    # surfaces even when python-object equality above passes
    import pandas as pd

    def strict(frame):
        frame = frame[cols].copy()
        for c in cols:
            col = frame[c]
            if pd.api.types.is_float_dtype(col):
                frame[c] = col.round(6)
            elif pd.api.types.is_datetime64_any_dtype(col):
                frame[c] = col.astype("datetime64[us]")
        return frame.astype(str).sort_values(cols).reset_index(drop=True)

    s_pd = strict(sdf.toPandas())
    d_pd = strict(rel.df())
    neq = (s_pd.values != d_pd.values).any(axis=1)
    assert not neq.any(), f"{name}: strict dtype-path mismatch, e.g. {s_pd[neq].head(2).to_dict()} vs {d_pd[neq].head(2).to_dict()}"


def test_entry_contract(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    names = set(entrymod.queries())
    oracle = entrymod.oracle_sql()
    assert set(oracle) <= names
    assert "cdc_merge_lww" in names


def test_no_oracle_emits_nested_columns(ducksql):
    """The driver's canonicalizer sorts result rows with pandas
    ``sort_values``, which raises ``TypeError: unhashable type`` on
    LIST/STRUCT/MAP cells (r11's one red CORRECTNESS row,
    embed_quantize_int8). Pin: every registered oracle's output schema
    must be flat scalars so any future panel rotation stays gradable.
    DESCRIBE is binder-only, so this sweeps all oracles cheaply."""
    offenders = []
    for name in sorted(QUERIES):
        sql = QUERIES[name].oracle
        if sql is None:
            continue
        for row in ducksql.sql(f"DESCRIBE ({sql})").fetchall():
            col, typ = row[0], row[1]
            if "[" in typ or "STRUCT" in typ or "MAP" in typ:
                offenders.append((name, col, typ))
    assert not offenders, f"nested oracle output columns: {offenders}"
