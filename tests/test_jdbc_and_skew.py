"""Golden tests for warehouse DDL/merge SQL generation (pkg/redshift
parity) and behavior tests for the skew/bucketing scale helpers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tipoca_stream_spark.functions.masking import MaskConfig
from tipoca_stream_spark.operators import skew
from tipoca_stream_spark.schema.model import ColInfo, Table
from tipoca_stream_spark.sources import jdbc


@pytest.fixture()
def customers_table():
    return Table(
        "customers",
        [
            ColInfo("id", "int", primary_key=True, not_null=True, sort_ordinal=1),
            ColInfo("email", "string", source_column_length=255, dist_key=True),
            ColInfo("score", "string", source_column_type="decimal(10,4)"),
            ColInfo("ssn", "string", masked=True),
            ColInfo("created_at", "long", source_column_type="datetime"),
        ],
    )


def test_create_table_ddl(customers_table):
    ddl = jdbc.create_table_sql(customers_table)
    assert '"id" INTEGER NOT NULL' in ddl
    assert '"email" VARCHAR(1020)' in ddl  # ×4 ratio (redshift.go:48)
    assert '"score" NUMERIC(10,4)' in ddl
    assert '"ssn" VARCHAR(50)' in ddl  # masked pin (redshift.go:31)
    assert '"created_at" TIMESTAMP WITHOUT TIME ZONE' in ddl
    assert 'PRIMARY KEY ("id")' in ddl
    assert 'DISTSTYLE KEY DISTKEY("email")' in ddl
    assert 'COMPOUND SORTKEY("id")' in ddl


def test_merge_sql_matches_reference_shape(customers_table):
    # M2 (redshift.go:666-698)
    s = jdbc.dedupe_sql("public", "customers_staged", ["id"])
    assert 'WHERE t1."kafkaoffset" < t2."kafkaoffset"' in s
    assert s.startswith('DELETE FROM "public"."customers_staged" WHERE "kafkaoffset" IN (')
    # M3 (redshift.go:701-753)
    s = jdbc.delete_common_sql("public", "customers_staged", "customers", ["id"])
    assert '("id") IN (' in s and 'JOIN "public"."customers" t2' in s
    # M4 (redshift.go:779-795)
    assert jdbc.delete_op_rows_sql("public", "customers_staged").endswith("= 'DELETE'")


def test_copy_unload_sql(customers_table):
    c = jdbc.copy_from_manifest_sql(customers_table, "s3://b/m.json")
    assert "MANIFEST TRUNCATECOLUMNS ACCEPTINVCHARS COMPUPDATE OFF STATUPDATE OFF GZIP JSON 'auto'" in c
    u = jdbc.unload_sql(customers_table, "s3://b/prefix", distinct=True)
    assert u.startswith("UNLOAD ('SELECT DISTINCT * FROM")


def test_rebuild_and_release_sql(customers_table):
    steps = jdbc.replace_table_sql(customers_table)
    assert steps[0].endswith('RENAME TO "customers_migrating"')
    assert steps[-1] == 'DROP TABLE "public"."customers_migrating" CASCADE'
    rel = jdbc.release_swap_sql("public", "customers")
    assert rel[1] == 'ALTER TABLE "public"."customers_ts_adx_reload" RENAME TO "customers"'


def test_alter_sql(customers_table):
    add = jdbc.alter_add_column_sql(customers_table, ColInfo("tier", "string"))
    assert add.endswith('ADD COLUMN "tier" VARCHAR(256)')
    resize = jdbc.alter_varchar_resize_sql(
        customers_table, ColInfo("email", "string", source_column_length=500)
    )
    assert resize.endswith('ALTER COLUMN "email" TYPE VARCHAR(2000)')


def test_grants(customers_table):
    g = jdbc.grant_sql("public", "customers", "analysts")
    assert g[0] == 'GRANT USAGE ON SCHEMA "public" TO GROUP "analysts"'


# --- skew & bucketing -------------------------------------------------------


def test_salted_join_matches_plain_join(spark):
    # 1 hot key (90% of rows) + uniform tail
    fact = spark.range(2000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 100).alias("label"))
    plain = fact.join(dim, "k").agg(F.sum("label"), F.count("*")).collect()[0]
    salted = skew.salted_join(fact, dim, "k").agg(F.sum("label"), F.count("*")).collect()[0]
    assert tuple(plain) == tuple(salted)


def test_salted_count_matches_groupby(spark):
    df = spark.range(5000).select((F.col("id") % 3).alias("k"))
    expect = {r["k"]: r["count"] for r in df.groupBy("k").count().collect()}
    got = {r["k"]: r["n"] for r in skew.salted_count(df, "k").collect()}
    assert got == expect


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS bt_left")
    spark.sql("DROP TABLE IF EXISTS bt_right")
    left = spark.range(1000).select(F.col("id").alias("k"), F.rand(1).alias("a"))
    right = spark.range(1000).select(F.col("id").alias("k"), F.rand(2).alias("b"))
    skew.write_bucketed(left, "bt_left", "k", n_buckets=4, sort_col="k")
    skew.write_bucketed(right, "bt_right", "k", n_buckets=4, sort_col="k")
    # force a sort-merge join: with broadcast allowed Catalyst broadcasts
    # these tiny tables and bucketing is moot
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = skew.bucketed_join(spark, "bt_left", "bt_right", "k")
        assert joined.count() == 1000
        assert not skew.explain_has_exchange(joined)  # co-located: no shuffle

        # contrast: the same join on plain parquet shuffles both sides
        left.write.mode("overwrite").parquet(str(tmp_path / "pl"))
        right.write.mode("overwrite").parquet(str(tmp_path / "pr"))
        plain = spark.read.parquet(str(tmp_path / "pl")).join(
            spark.read.parquet(str(tmp_path / "pr")), "k"
        )
        assert skew.explain_has_exchange(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)


def test_mask_config_from_yaml(tmp_path):
    y = tmp_path / "db.yaml"
    y.write_text(
        """
tables:
  customers:
    non_pii_keys: [ID]
    length_keys: [email]
include_tables: [Customers]
"""
    )
    cfg = MaskConfig.from_yaml(str(y), salt="s")
    assert cfg.table_included("CUSTOMERS")
    assert cfg.rules_for("customers").non_pii_keys == ["id"]
    assert cfg.rules_for("customers").length_keys == ["email"]
