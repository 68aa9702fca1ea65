"""Degenerate-input sweep: every registered query must run on a ZERO-ROW
dataset (same schemas as the driver testdata) and agree with its DuckDB
oracle there.

Empty inputs are not exotic at 100 TB — a curation filter can pass
nothing, a partition can be empty, a time window can miss every row.
This sweep found and pinned five real defects on first run (round 8):

- ``packing.global_token_offsets`` failed analysis (zero-entry
  ``create_map`` base-offset literal — tests/test_packing.py);
- ``operators/pagerank.py`` divided by a zero node count;
- three ``plans/extended.py`` storage queries fed a driver-side
  ``collect()`` scalar (min/max key) straight into an index probe:
  NULL keys now short-circuit to the empty answer, matching SQL
  ``col = NULL`` semantics;
- the versioned target's TEXT sidecar: a ``partitionBy`` writer given
  zero rows commits only ``_SUCCESS`` (no part files), and
  ``_sidecar_ready`` misread that empty-but-committed sidecar as
  "text_col never declared" — ``sources/target.py`` readers now serve
  empty results off it (``_read_text_postings``).

The three CUBE/ROLLUP/GROUPING SETS queries are pinned separately:
Spark emits NO grand-total row for an empty input while DuckDB (and the
SQL standard, and PostgreSQL) emit one all-NULL group aggregating zero
rows — a documented engine divergence, not a repo defect; on any
non-empty input the oracle match holds (the regular sweep).
"""

from __future__ import annotations

import math

import duckdb
import pyarrow.parquet as pq
import pytest

from tipoca_stream_spark.plans import QUERIES

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Engine-semantics divergence on empty input (see module docstring):
# Spark's cube/rollup/groupingSets emit no grand-total grouping for an
# empty child; DuckDB emits the standard all-NULL zero-count row.
GRAND_TOTAL_DIVERGENT = {
    "agg_cube_lineitem",
    "agg_grouping_sets",
    "agg_rollup_orders",
}


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        src = f"/root/testdata/sf0.001/{t}.parquet"
        pq.write_table(pq.read_table(src).slice(0, 0), str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def duck_empty(empty_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{empty_sf_dir}/{t}.parquet')"
        )
    return con


def _norm(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                v = round(v, 6) if math.isfinite(v) else v
            if hasattr(v, "as_integer_ratio") and not isinstance(v, (int, float)):
                v = float(v)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_empty_input(spark, empty_sf_dir, duck_empty, name):
    qdef = QUERIES[name]
    sdf = qdef.fn(spark, empty_sf_dir)
    spark_rows = [r.asDict() for r in sdf.collect()]

    rel = duck_empty.sql(qdef.oracle)
    duck_cols = list(rel.columns)
    duck_rows = [dict(zip(duck_cols, r)) for r in rel.fetchall()]

    if name in GRAND_TOTAL_DIVERGENT:
        # pin the divergence exactly: Spark empty, DuckDB one all-NULL-key
        # grand-total row whose aggregates are over zero rows
        assert spark_rows == []
        assert len(duck_rows) == 1
        return

    assert sorted(sdf.columns) == sorted(duck_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rows {len(spark_rows)} != {len(duck_rows)}"
    )
    cols = sorted(duck_cols)
    assert _norm(spark_rows, cols) == _norm(duck_rows, cols), f"{name}: values"
