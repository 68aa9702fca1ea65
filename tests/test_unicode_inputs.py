"""Unicode-input sweep for the text family: every text-consuming
registered query runs on multi-byte UTF-8 input (CJK, emoji, accents,
combining vs precomposed forms, tabs/newlines) and must agree with its
DuckDB oracle.

The corpus convention everywhere is "split on single space over UTF-8
strings" — this sweep pins that Spark and DuckDB agree on the parts the
tokenizers, fingerprints and hashes lean on (length(), md5() over UTF-8
bytes, string_split, ascii()/codepoints, lower()) for real-world text,
not just the ASCII synthetic corpus. First run (round 8): 56/56 green
with no code changes needed — the pin exists so a refactor can't
silently break the convention.
"""

from __future__ import annotations

import math

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tipoca_stream_spark.plans import QUERIES

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

UNICODE_TEXTS = [
    "héllo wörld naïve café über garçon",
    "日本語 テキスト 処理 と 分散 計算",
    "emoji 🎉 test 🚀 tokens 🎉 again",
    "mixed ascii héllo 日本語 🎉 end",
    "tab\tand\nnewline separated words",
    "combining é acute vs precomposed é forms",
]

TEXT_FAMILY_PREFIXES = (
    "text_", "bpe_", "dedup_", "corpus_", "training_", "pack_",
    "mixture_", "dq_", "mask_scrub", "analytics_source_overlap",
    "quality_calibration",
)

NAMES = [
    n for n in sorted(QUERIES)
    if any(k in n for k in TEXT_FAMILY_PREFIXES)
]


@pytest.fixture(scope="module")
def uni_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_uni")
    for t in TABLES:
        src = pq.read_table(f"/root/testdata/sf0.001/{t}.parquet")
        if t != "documents":
            pq.write_table(
                src.slice(0, 50) if src.num_rows > 50 else src,
                str(d / f"{t}.parquet"),
            )
            continue
        rows = src.slice(0, 10).to_pylist()
        for i, txt in enumerate(UNICODE_TEXTS):
            r = dict(rows[0])
            r["doc_id"] = 800000 + i
            r["text"] = txt
            r["n_chars"] = len(txt)
            rows.append(r)
        pq.write_table(
            pa.Table.from_pylist(rows, schema=src.schema),
            str(d / f"{t}.parquet"),
        )
    return str(d)


@pytest.fixture(scope="module")
def duck_uni(uni_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{uni_sf_dir}/{t}.parquet')"
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


@pytest.mark.parametrize("name", NAMES)
def test_text_query_on_unicode(spark, uni_sf_dir, duck_uni, name):
    qdef = QUERIES[name]
    sdf = qdef.fn(spark, uni_sf_dir)
    spark_rows = [r.asDict() for r in sdf.collect()]

    rel = duck_uni.sql(qdef.oracle)
    duck_cols = list(rel.columns)
    duck_rows = [dict(zip(duck_cols, r)) for r in rel.fetchall()]

    assert sorted(sdf.columns) == sorted(duck_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rows {len(spark_rows)} != {len(duck_rows)}"
    )
    cols = sorted(duck_cols)
    assert _norm(spark_rows, cols) == _norm(duck_rows, cols), f"{name}: values"
