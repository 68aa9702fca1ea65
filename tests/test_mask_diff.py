"""Mask-diff (O5) tests, ported from the reference's table-driven corpus
(pkg/transformer/masker/mask_diff_test.go:10-50 over database.yaml vs
database_maskdiff.yaml, and controllers/mask_diff.go topic wiring)."""

from __future__ import annotations

import textwrap

from tipoca_stream_spark.functions.mask_diff import (
    load_reference_mask_config,
    mask_reload_plan,
    modified_tables,
    parse_topic,
)
from tipoca_stream_spark.functions.masking import MaskConfig, TableMaskRules

# distilled from masker/database.yaml (the fixture the reference test loads)
CURRENT_YAML = textwrap.dedent(
    """
    non_pii_keys:
        customers:
        - id
        - notes
        justifications:
        - source
        - type
        - createdAt
        - updatedAt
        establishments:
        - id
        settings:
        - id
    conditional_non_pii_keys:
        justifications:
            justice:
            - 'mahatma'
            Reason:
            - 'want'
        customers:
            email:
            - '%example.com'
            - '%exampledev.com'
            notes:
            - 'I am not interested in politics'
    dependent_non_pii_keys:
        justifications:
            Justice:
                Reason:
                - 'want'
        customers:
            first_name:
                last_name:
                - 'Jones'
                - 'Dhoni'
    length_keys:
        customers:
        - email
    mobile_keys:
        customers:
        - mobile_number
    regex_pattern_boolean_keys:
        customers:
            favourite_quote:
                has_philosphy: 'life|time'
            favourite_food:
                has_pizza: 'pizza'
    """
)

# distilled from masker/database_maskdiff.yaml: notes un-allow-listed,
# new unmask rows for justifications/establishments, a whole new table,
# and the entire regex section removed
DESIRED_YAML = textwrap.dedent(
    """
    non_pii_keys:
        customers:
        - id
        justifications:
        - source
        - type
        - createdAt
        - updatedAt
        - addedNewRowToUnmask
        establishments:
        - id
        - addedNewRowToUnmask
        settings:
        - id
    conditional_non_pii_keys:
        justifications:
            justice:
            - 'mahatma'
            Reason:
            - 'want'
        customers:
            email:
            - '%example.com'
            - '%exampledev.com'
    dependent_non_pii_keys:
        justifications:
            Justice:
                Reason:
                - 'want'
        customers:
            first_name:
                last_name:
                - 'Jones'
                - 'Dhoni'
        addedNewTable:
            Justice:
                Reason:
                - 'want'
    length_keys:
        customers:
        - email
    mobile_keys:
        customers:
        - mobile_number
    """
)


def _cfg(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return load_reference_mask_config(str(p), salt="s")


def test_identical_configs_diff_empty(tmp_path):
    # mask_diff_test.go:31-36: m0 vs m1 (same file) -> no difference
    a = _cfg(tmp_path, "a.yaml", CURRENT_YAML)
    b = _cfg(tmp_path, "b.yaml", CURRENT_YAML)
    assert modified_tables(a, b) == set()


def test_reference_diff_corpus(tmp_path):
    # mask_diff_test.go:38-50 expected set (engine-lowercased, P16)
    cur = _cfg(tmp_path, "cur.yaml", CURRENT_YAML)
    des = _cfg(tmp_path, "des.yaml", DESIRED_YAML)
    assert modified_tables(cur, des) == {
        "justifications",
        "establishments",
        "customers",
        "addednewtable",
    }


def test_removed_only_section_not_flagged():
    # mask_diff.go iterates the desired side: a rule section present only in
    # CURRENT (regex keys removed wholesale) does not by itself flag a table
    cur = MaskConfig(
        salt="s",
        tables={"t": TableMaskRules(regex_pattern_boolean_keys={"c": {"x": "p"}})},
    )
    des = MaskConfig(salt="s", tables={})
    assert modified_tables(cur, des) == set()


def test_case_only_rename_is_not_a_modification():
    # documented divergence: rules compare post-normalization, so a
    # case-only rename compiles to the same plan and needs no reload
    cur = MaskConfig(salt="s", tables={"t": TableMaskRules(non_pii_keys=["Email"])})
    des = MaskConfig(salt="s", tables={"T": TableMaskRules(non_pii_keys=["email"])})
    assert modified_tables(cur, des) == set()


def test_parse_topic():
    assert parse_topic("db.server.customers") == ("db", "server", "customers")


def test_mask_reload_plan_topics_and_include_tables(tmp_path):
    cur = _cfg(tmp_path, "cur.yaml", CURRENT_YAML)
    des = _cfg(tmp_path, "des.yaml", DESIRED_YAML)
    des.include_tables = ["customers", "justifications", "settings"]
    topics = [
        "db.server.customers",
        "db.server.justifications",
        "db.server.establishments",  # modified but excluded by include_tables
        "db.server.settings",  # included but unmodified
        "db.server.other",  # not in include_tables
    ]
    plan = mask_reload_plan(topics, des, cur)
    assert plan.modified_topics == ["db.server.customers", "db.server.justifications"]
    assert plan.topics == [
        "db.server.customers",
        "db.server.justifications",
        "db.server.settings",
    ]
    assert plan.include_tables == ["customers", "justifications", "settings"]


def test_mask_reload_plan_first_deployment(tmp_path):
    # currentVersion == "" in the operator: every included topic reloads
    des = _cfg(tmp_path, "des.yaml", DESIRED_YAML)
    topics = ["db.server.customers", "db.server.settings"]
    plan = mask_reload_plan(topics, des, current=None)
    assert plan.modified_topics == topics


def test_supervisor_reconcile_mask_change(spark, tmp_path):
    from tipoca_stream_spark.streaming.supervisor import Supervisor

    cur = MaskConfig(salt="s", tables={"a": TableMaskRules(non_pii_keys=["id"])})
    des = MaskConfig(
        salt="s",
        tables={
            "a": TableMaskRules(non_pii_keys=["id", "email"]),
            "b": TableMaskRules(non_pii_keys=["id"]),
        },
    )

    class FakePipeline:  # only the supervisor-facing surface
        def __init__(self, name):
            self.name = name
            self.target = None

    sup = Supervisor(spark)
    sup.tables = {}
    for n in ["a", "c"]:
        sup.tables[n] = type(
            "MT", (), {"main": FakePipeline(n), "reload": None, "released": True}
        )()
    begun = sup.reconcile_mask_change(cur, des, lambda n: FakePipeline(f"{n}_reload"))
    assert begun == ["a"]  # changed + managed; "b" unmanaged, "c" unchanged
    assert sup.tables["a"].reload.name == "a_reload"
    assert sup.tables["a"].released is False


def test_mask_reload_e2e_diff_backfill_release(spark, tmp_path):
    """The full O2/O5/O6 loop with real pipelines: a mask-config change is
    diffed, the changed table gets a reload pipeline carrying the DESIRED
    config, the backfill runs in batch mode, and the release pass swaps the
    main target to the remasked data."""
    import hashlib

    from pyspark.sql import types as T

    from tipoca_stream_spark.streaming.pipeline import CdcPipeline, CdcPipelineConfig
    from tipoca_stream_spark.streaming.supervisor import LagMonitor, Supervisor

    salt = "testhash"
    sha = lambda v: hashlib.sha1((v + salt).encode()).hexdigest()
    row_schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    raw_schema = T.StructType(
        [
            T.StructField("topic", T.StringType()),
            T.StructField("partition", T.IntegerType()),
            T.StructField("offset", T.LongType()),
            T.StructField("value", T.StringType()),
        ]
    )

    def envelope(id_, name, offset):
        import json

        return {
            "topic": "db.server.customers",
            "partition": 0,
            "offset": offset,
            "value": json.dumps(
                {"before": None, "after": {"id": id_, "name": name}, "op": "c",
                 "ts_ms": offset}
            ),
        }

    def make_pipeline(name, mask_cfg, mask_table=None):
        return CdcPipeline(
            spark,
            CdcPipelineConfig(
                table=name,
                primary_keys=["id"],
                row_schema=row_schema,
                target_root=str(tmp_path / "targets"),
                checkpoint_dir=str(tmp_path / "ckpt" / name),
                mask_config=mask_cfg,
                mask_table=mask_table,
            ),
        )

    current = MaskConfig(salt=salt, tables={"customers": TableMaskRules()})  # mask all
    desired = MaskConfig(
        salt=salt, tables={"customers": TableMaskRules(non_pii_keys=["name"])}
    )

    raw = spark.createDataFrame(
        [envelope(1, "alice", 0), envelope(2, "bob", 1)], raw_schema
    )
    main = make_pipeline("customers", current)
    main.run_batch(raw, epoch_id=0)
    masked = {r["id"]: r["name"] for r in main.target.read().collect()}
    assert masked == {sha("1"): sha("alice"), sha("2"): sha("bob")}

    lag = LagMonitor()
    sup = Supervisor(spark, lag_monitor=lag)
    sup.add_table("customers", main)
    begun = sup.reconcile_mask_change(
        current, desired, lambda n: make_pipeline(f"{n}_reload", desired, mask_table=n)
    )
    assert begun == ["customers"]

    # reload backfill with the desired config, then the release swap
    sup.tables["customers"].reload.run_batch(raw, epoch_id=0)
    lag.observe_progress("customers_reload", 0)  # realtime
    assert sup.release_pass() == ["customers"]
    remasked = {r["id"]: r["name"] for r in main.target.read().collect()}
    assert remasked == {sha("1"): "alice", sha("2"): "bob"}  # name now clear
    assert sup.tables["customers"].released is True
