"""Masking suite golden tests, ported from the reference's table-driven
corpus (pkg/transformer/masker/masker_test.go:11-663, fixture config
pkg/transformer/masker/database.yaml; FIXTURES.md F1-F4)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row

from tipoca_stream_spark.functions.masking import MaskConfig, TableMaskRules, apply_mask, like_to_regex

SALT = "testhash"


def sha1(v: str) -> str:
    return hashlib.sha1((v + SALT).encode()).hexdigest()


@pytest.fixture(scope="module")
def config() -> MaskConfig:
    # distilled from pkg/transformer/masker/database.yaml (FIXTURES.md F1-F4)
    return MaskConfig(
        salt=SALT,
        tables={
            "customers": TableMaskRules(
                non_pii_keys=["id"],
                conditional_non_pii_keys={"email": ["%example.com", "%exampledev.com"], "notes": ["I am not interested in politics"]},
                dependent_non_pii_keys={"first_name": {"last_name": ["Jones", "Dhoni"]}},
                length_keys=["email"],
                mobile_keys=["mobile_number"],
                regex_pattern_boolean_keys={
                    "dob": {"1986born": "1986-.*", "1988born": "1988-.*"},
                    "favourite_quote": {"has_philosphy": "life|time"},
                    "favourite_food": {"has_pizza": "pizza"},
                },
            ),
            "justifications": TableMaskRules(
                non_pii_keys=["source", "type", "createdAt", "updatedAt"],
                dependent_non_pii_keys={"Justice": {"Reason": ["want"]}},
                conditional_non_pii_keys={"reason": ["want"]},
                sort_keys=["createdAt"],
                dist_keys=["source"],
            ),
            "establishments": TableMaskRules(mapping_pii_keys=["id"]),
            "settings": TableMaskRules(non_pii_keys=["id"]),
        },
    )


CUSTOMER_COLS = ["first_name", "last_name", "email", "mobile_number", "dob",
                 "notes", "favourite_quote", "favourite_food"]


def cust_df(spark, rows):
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("id", T.IntegerType())]
        + [T.StructField(c, T.StringType()) for c in CUSTOMER_COLS]
    )
    return spark.createDataFrame(
        [tuple(r.get(c) for c in ["id"] + CUSTOMER_COLS) for r in rows], schema
    )


def test_golden_hash_values():
    # masker_test.go:24-30,139
    assert sha1("275402") == "95b623a5d57372c26025828015f537ad42104f9c"
    assert sha1("Batman") == "9ba53e85b996f6278aa647d8da8f355aafd16149"


def test_default_mask_and_non_pii(spark, config):
    df = cust_df(spark, [dict(id=275402, first_name="Bruce", last_name="Wayne",
                              email="bruce@wayne.com", mobile_number="+919812345678",
                              dob="1986-02-19", favourite_quote="I like the nightlife",
                              favourite_food="pizza margherita")])
    out = apply_mask(df, config, "customers").collect()[0].asDict()
    assert out["id"] == "275402"  # non-PII kept (stringly, as normalized)
    assert out["first_name"] == sha1("Bruce")  # masked: Wayne not in dependent list
    assert out["last_name"] == sha1("Wayne")
    assert out["email"] == sha1("bruce@wayne.com")  # no pattern match
    assert out["email_length"] == len("bruce@wayne.com")
    assert out["mobile_number_init5"] == "+9198"
    assert out["mobile_number"] == sha1("+919812345678")
    assert out["dob_1986born"] is True
    assert out["dob_1988born"] is False
    assert out["favourite_quote_has_philosphy"] is True  # "life" inside "nightlife"
    assert out["favourite_food_has_pizza"] is True


def test_extra_columns_prepended_sorted(spark, config):
    df = cust_df(spark, [dict(id=1, first_name="a", last_name="b", email="c@d.com",
                              mobile_number="12345", dob="1990-01-01", notes="x",
                              favourite_quote="q", favourite_food="f")])
    cols = apply_mask(df, config, "customers").columns
    extras = ["dob_1986born", "dob_1988born", "email_length", "favourite_food_has_pizza",
              "favourite_quote_has_philosphy", "mobile_number_init5"]
    assert cols[: len(extras)] == extras  # debezium/schema.go:495 name-sorted, prepended


def test_conditional_unmask(spark, config):
    df = cust_df(spark, [dict(id=1, first_name="x", last_name="y", email="a@example.com",
                              notes="I am not interested in politics")])
    out = apply_mask(df, config, "customers").collect()[0].asDict()
    assert out["email"] == "a@example.com"  # %example.com matches
    assert out["notes"] == "I am not interested in politics"  # exact pattern


def test_conditional_is_anchored_and_case_sensitive(spark, config):
    df = cust_df(spark, [dict(id=1, first_name="x", last_name="y", email="a@EXAMPLE.com",
                              notes="I am not interested in politics at all")])
    out = apply_mask(df, config, "customers").collect()[0].asDict()
    assert out["email"] == sha1("a@EXAMPLE.com")  # case-sensitive → masked
    assert out["notes"] == sha1("I am not interested in politics at all")  # anchored → masked


def test_dependent_unmask(spark, config):
    df = cust_df(spark, [dict(id=1, first_name="Indiana", last_name="Jones", email="e@f.com"),
                         dict(id=2, first_name="James", last_name="Bond", email="e@f.com")])
    rows = {r["id"]: r.asDict() for r in apply_mask(df, config, "customers").collect()}
    assert rows["1"]["first_name"] == "Indiana"  # last_name ∈ {Jones, Dhoni}
    assert rows["2"]["first_name"] == sha1("James")


def test_mapping_pii_table_wide_unmask(spark, config):
    # FIXTURES.md F3: id=2011 → hashed_id golden; other columns unmasked table-wide
    df = spark.createDataFrame([Row(id=2011, name="Clinic A")])
    out = apply_mask(df, config, "establishments").collect()[0].asDict()
    assert out["hashed_id"] == "9b8297b23539abcda0344522bca05a99feecba10"
    assert out["id"] == "2011"  # kept clear
    assert out["name"] == "Clinic A"  # table-wide unmask (masker.go:159-162)


def test_missing_column_backfill(spark, config):
    # FIXTURES.md F4: events omit plan_enabled → NULL backfill (masker.go:51-59)
    from pyspark.sql import types as T
    df = spark.createDataFrame([(7,)], T.StructType([T.StructField("id", T.IntegerType())]))
    out = apply_mask(df, config, "settings", schema_columns=["id", "plan_enabled"]).collect()[0]
    assert out["plan_enabled"] is None
    assert out["id"] == "7"


def test_null_and_whitespace_normalization(spark, config):
    # masker.go:164-166: nil or whitespace-only → NULL (and never hashed)
    df = cust_df(spark, [dict(id=1, first_name="   ", email="e@f.com")])
    out = apply_mask(df, config, "customers").collect()[0].asDict()
    assert out["first_name"] is None
    assert out["last_name"] is None
    assert out["email_length"] == len("e@f.com")
    assert out["mobile_number_init5"] is None


def test_case_insensitive_config_and_columns(spark, config):
    # masker_test.go:204-219: mixed-case config keys + column names line up
    df = spark.createDataFrame(
        [Row(source="app", type="t", createdAt="2020-01-01 00:00:00", updatedAt="2020-01-02 00:00:00",
             justice="served", reason="want", email="j@k.com")]
    )
    out = apply_mask(df, config, "justifications").collect()[0].asDict()
    assert out["justice"] == "served"  # dependent: reason == want
    assert out["reason"] == "want"  # conditional exact pattern
    assert out["email"] == sha1("j@k.com")
    assert out["createdat"] == "2020-01-01 00:00:00"  # non-PII, lowercased name


def test_include_tables_filter(spark):
    cfg = MaskConfig(salt=SALT, tables={}, include_tables=["customers"])
    df = spark.createDataFrame([Row(id=1, secret="s")])
    out = apply_mask(df, cfg, "other_table").collect()[0].asDict()
    assert out == {"id": 1, "secret": "s"}  # excluded table passes through


def test_like_to_regex():
    # mask_config.go:443-445: ONLY % is rewritten; '.' and '_' pass through
    # as live regex / literal underscore respectively
    assert like_to_regex("%example.com") == "^.*example.com$"
    assert like_to_regex("want") == "^want$"
    assert like_to_regex("FOO_%") == "^FOO_.*$"


def test_conditional_underscore_is_literal(spark, config):
    # mask_config.go:443: '_' is NOT a single-char wildcard — 'FOO_%' must not
    # unmask 'FOOXbar'
    cfg = MaskConfig(
        salt=SALT,
        tables={"t": TableMaskRules(conditional_non_pii_keys={"v": ["FOO_%"]})},
    )
    df = spark.createDataFrame([Row(id=1, v="FOO_bar"), Row(id=2, v="FOOXbar")])
    out = {r["id"]: r["v"] for r in apply_mask(df, cfg, "t").collect()}
    assert out[sha1("1")] == "FOO_bar"
    assert out[sha1("2")] == sha1("FOOXbar")


def test_regex_bool_null_value_is_false_and_classes_survive(spark):
    # mask_config.go:354-371: (?i) prefix (no pattern lowercasing, so \D keeps
    # its meaning); nil value → 'false', never NULL
    cfg = MaskConfig(
        salt=SALT,
        tables={
            "t": TableMaskRules(
                regex_pattern_boolean_keys={"v": {"nondigit": r".*\D.*", "hasfoo": "FOO"}}
            )
        },
    )
    df = spark.createDataFrame(
        [Row(id=1, v="abc"), Row(id=2, v="123"), Row(id=3, v=None), Row(id=4, v="x foo y")]
    )
    rows = {r["id"]: r for r in apply_mask(df, cfg, "t").collect()}
    assert rows[sha1("1")]["v_nondigit"] is True
    assert rows[sha1("2")]["v_nondigit"] is False
    assert rows[sha1("3")]["v_nondigit"] is False  # NULL → false, not NULL
    assert rows[sha1("4")]["v_hasfoo"] is True  # case-insensitive via (?i)


def test_length_key_counts_raw_whitespace(spark):
    # masker.go:99-111: length is computed on the raw value BEFORE the
    # whitespace→NULL normalization: ' ' → 1; only true NULL → 0
    cfg = MaskConfig(salt=SALT, tables={"t": TableMaskRules(length_keys=["v"])})
    df = spark.createDataFrame([Row(id=1, v=" "), Row(id=2, v=None), Row(id=3, v="abc")])
    rows = {r["id"]: r for r in apply_mask(df, cfg, "t").collect()}
    assert rows[sha1("1")]["v_length"] == 1
    assert rows[sha1("1")]["v"] is None  # main column still normalized to NULL
    assert rows[sha1("2")]["v_length"] == 0
    assert rows[sha1("3")]["v_length"] == 3
