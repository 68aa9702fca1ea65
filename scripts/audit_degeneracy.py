"""Degeneracy audit over the whole registry: oracle equality alone can
grade a DEGENERATE regime green (round-8 finding: one-cell IVF and
one-code PQ hash-matched their oracles for seven rounds, because both
engines shared the wrongly-scaled literals). This script runs every
registered query's DuckDB ORACLE at sf0.01 (fast — no JVM) and reports
the distributional smells a human should adjudicate:

- zero-row outputs (operator may be gated off by the data);
- single-row outputs for queries whose name suggests pairs/buckets;
- constant columns across >3 rows (booleans stuck at one value, a
  score that never varies, an id column that collapsed).

Known by-design constants are allowlisted with the reason inline, so a
re-run surfaces only NEW smells. Exit code 0 always — this is an audit,
not a gate (a constant column is a lead, not automatically a bug: the
gopher sub-gates are legitimately all-True on the clean synthetic
corpus while the composite still splits 317/183).

Usage: python scripts/audit_degeneracy.py [sf_dir] → one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# column-level constants that are the CONTRACT, not a collapse — every
# entry adjudicated in ROUND8_NOTES.md §16/§18
ALLOW = {
    ("text_gopher_quality", "*"),  # clean corpus: sub-gates pass; composite splits 317/183
    ("text_langid", "*"),          # synthetic non-en docs hold en tokens — no signal exists
    ("agg_approx_distinct", "*"),  # approx_within_5pct True IS the checked contract
    ("similarity_ivf_recall", "*"),
    ("similarity_pq_recall", "*"),
    ("embed_matryoshka_recall", "*"),  # single-row recall summaries
    ("dq_orders_gate", "*"), ("dq_orders_fk_gate", "*"),  # gates: pass flags
    ("agg_hll_sketch_rollup", "*"),  # exact-vs-merged within-5pct contract row
    ("agg_string_concat", "*"),      # uniform 5-per-group synthetic grouping
    ("dq_chisq_drift", "*"), ("dq_psi_drift", "*"),  # per-row carried totals
    ("events_gapfill_locf", "*"),    # query is scoped to one event type by design
    ("events_retention_cohorts", "*"),  # every synthetic user is active from week 1
    ("mask_pipeline", "*"), ("mask_scrub_digits", "*"),  # Customer#<9 digits> name pattern
    ("multimodal_pixel_roundtrip", "*"),  # fixture images are 6 rows tall
    ("scalar_date_suite2", "*"), ("scalar_map_suite", "*"),
    ("scalar_string_suite2", "*"), ("scalar_trycast_suite", "*"),  # literal edge-case suites
    ("storage_bloom_point_read", "*"), ("storage_routed_point_read", "*"),
    ("storage_routed_composite_read", "*"),  # point reads return the probed key
    ("text_boilerplate_shingles", "*"),  # planted boilerplate hits a uniform doc_frac
    ("dedup_exact", "*"),  # no exact-dup texts below sf0.1 (data property; planted-dup
                           # coverage lives in the corpus_dedup/incremental test suites)
    ("dedup_containment", "*"),  # the data's one genuine above-threshold subsumption
    ("m3_delete_common_anti", "*"),  # emptiness after delete IS the check
    ("setop_except_inactive_customers", "*"),  # all synthetic customers are active
    ("multimodal_features", "*"),  # registered adapter wraps image payloads only;
                                   # WAV/MP4 extraction is test-covered
    ("multimodal_audio_roundtrip", "*"),  # mono by design — the signal roundtrip
                                          # isolates PCM decode; multi-channel is
                                          # graded by multimodal_mixed_features
    ("training_fim_transform", "*"),  # every sf0.01 doc has >= 10 words; the
                                      # <3-word passthrough branch is exercised
                                      # by the NULL/empty sweeps
    ("corpus_dedup_rate_by_source", "*"),  # n_docs=25/source: the generator
                                           # spreads 500 docs evenly over 20
                                           # sources; n_distinct (23-25) and
                                           # dup_rate (0-0.08) DO vary — the
                                           # telemetry the query exists for
    ("dq_fk_matrix", "*"),  # n_orphans=0 on all 7 edges: the synthetic data
                            # maintains referential integrity by construction
                            # (TESTDATA.md / make_scale_dataset FK offsets);
                            # orphan DETECTION is pinned with planted orphans
                            # in tests/test_quality_gate.py::test_fk_violations_detects_orphans
                            # (registered after r8's final audit run, which is
                            # why the r8 artifact didn't carry this entry)
}


def main() -> None:
    import __spark_entry__ as e

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{sf}/{t}.parquet')"
        )
    report: dict[str, list[str]] = {}
    for name, sql in sorted(e.oracle_sql().items()):
        smells: list[str] = []
        try:
            cur = con.execute(sql)
            cols = [d[0] for d in cur.description]
            rows = cur.fetchall()
        except Exception as ex:  # noqa: BLE001 - audit records, never raises
            report[name] = [f"oracle error: {str(ex)[:100]}"]
            continue
        if (name, "*") in ALLOW:
            continue
        if not rows:
            smells.append("zero rows")
        elif len(rows) == 1 and any(
            k in name for k in ("pairs", "buckets", "topk", "dedup_")
        ):
            smells.append("single row")
        if len(rows) > 3:
            for ci, col in enumerate(cols):
                vals = {repr(r[ci]) for r in rows[:5000]}  # repr: lists unhashable
                if len(vals) == 1:
                    smells.append(f"constant column {col}={next(iter(vals))}")
        if smells:
            report[name] = smells
    print(json.dumps({"audit": "degeneracy", "sf_dir": sf, "findings": report}))


if __name__ == "__main__":
    main()
