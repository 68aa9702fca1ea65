"""NULL-input sweep: every registered query must run on a dataset whose
nullable columns actually hold NULLs and agree with its DuckDB oracle.

The dataset is 3 real rows + 2 all-NULL-except-key rows per table —
the shape real CDC/curation pipelines see (a late-arriving column, a
malformed record, an optional field). The sweep found, and this file
now pins, a batch of NULL-semantics defects (round 8):

- ANSI Spark raised DIVIDE_BY_ZERO where DuckDB yields NULL: a
  single-row group's ``n-1`` variance denominator (``agg_stats_exact``,
  ``events_zscore_outliers``) and a zero split total (``dq_psi_drift``)
  — all now ``F.try_divide``, which matches DuckDB exactly;
- the BPE encode UDF stringified NULL text into a literal ``"None"``
  token (silent corpus corruption — operators/bpe.py);
- ``multimodal_features`` coerced a NULL payload to ``b""`` and emitted
  the EMPTY payload's features/digest for it (aliasing NULL media with
  genuinely-empty media);
- ``text_fingerprint`` aliased NULL docs with empty docs the same way
  (``concat_ws`` coerces a NULL array to '');
- ``agg_hll_sketch_rollup`` dropped the NULL group at its inner
  equi-join (SQL ``NULL = NULL``) — now ``eqNullSafe``, n_days counts
  non-null days;
- ``agg_string_concat`` emitted '' where SQL string_agg over an
  all-NULL group is NULL;
- four ORACLES were NULL-unsafe while the Spark side was right:
  ``NOT (pred)`` complement filters dropped NULL-predicate survivors of
  DELETE WHERE (``storage_dv_read``, ``storage_bucketed_delete_where``
  — DELETE removes only predicate-TRUE rows), ``NOT IN`` lost NULL ops
  (``a1_batch_event_counts``), and ``mask_pipeline``'s oracle disagreed
  with the REFERENCE's own NULL semantics (masker.go:100-103 emits
  length 0 for nil; mask_config.go:365-369 emits boolean false).

KNOWN_DIVERGENT pins the residual engine/contract differences instead
of hiding them; each entry states the contract.
"""

from __future__ import annotations

import math

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tipoca_stream_spark.plans import QUERIES

TABLES = {
    "region": "r_regionkey", "nation": "n_nationkey", "customer": "c_custkey",
    "supplier": "s_suppkey", "part": "p_partkey", "orders": "o_orderkey",
    "lineitem": "l_orderkey", "events": "event_id", "documents": "doc_id",
    "embeddings": "vec_id",
}

# Residual divergences, each a stated contract (not a defect):
KNOWN_DIVERGENT = {
    # approx_percentile is an approximation; its rank-band flag is only
    # contractual on non-degenerate groups (a 1-real-row group's sketch
    # can land outside the exact rank band). Real-data sweep pins it.
    "agg_approx_percentile",
    # CDC primary keys are NOT NULL by contract (the reference declares
    # PKs on every Redshift target, jdbc.py D1; Debezium keys are never
    # null). Spark's groupBy ranks a NULL-key row; the oracle's
    # equi-join drops it — neither is meaningful input.
    "cdc_merge_lww",
    # event-time operators require non-null timestamps: Spark's
    # window()/session_window() EXCLUDE null-ts rows by definition,
    # DuckDB buckets them as a NULL group. Kafka records always carry a
    # timestamp; a null ts is upstream corruption, not late data.
    "events_session_window_native",
    "events_windowed_agg",
}


@pytest.fixture(scope="module")
def nulls_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_nulls")
    for t, key in TABLES.items():
        src = pq.read_table(f"/root/testdata/sf0.001/{t}.parquet")
        rows = src.slice(0, 3).to_pylist()
        for i in (900001, 900002):
            row = {f.name: None for f in src.schema}
            row[key] = i
            rows.append(row)
        pq.write_table(
            pa.Table.from_pylist(rows, schema=src.schema),
            str(d / f"{t}.parquet"),
        )
    return str(d)


@pytest.fixture(scope="module")
def duck_nulls(nulls_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{nulls_sf_dir}/{t}.parquet')"
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
def test_query_survives_null_inputs(spark, nulls_sf_dir, duck_nulls, name):
    qdef = QUERIES[name]
    sdf = qdef.fn(spark, nulls_sf_dir)
    spark_rows = [r.asDict() for r in sdf.collect()]  # must not raise

    rel = duck_nulls.sql(qdef.oracle)
    duck_cols = list(rel.columns)
    duck_rows = [dict(zip(duck_cols, r)) for r in rel.fetchall()]

    if name in KNOWN_DIVERGENT:
        return  # both sides ran; the divergence contract is documented above

    assert sorted(sdf.columns) == sorted(duck_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rows {len(spark_rows)} != {len(duck_rows)}"
    )
    cols = sorted(duck_cols)
    assert _norm(spark_rows, cols) == _norm(duck_rows, cols), f"{name}: values"
