"""Type-mapping golden tests (pkg/redshift/redshift_test.go:30-360, 28 cases)
and temporal-conversion golden tests (debezium/message_test.go:7-116,
FIXTURES.md F6/F7)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tipoca_stream_spark.functions.temporal import (
    debezium_date,
    debezium_datetime_micros,
    debezium_datetime_millis,
    debezium_time_micros,
    debezium_timestamp_iso,
    format_datetime,
)
from tipoca_stream_spark.schema.migrate import MigrationKind, diff_schemas, plan_requires_rebuild
from tipoca_stream_spark.schema.model import ColInfo, Table
from tipoca_stream_spark.schema.types import (
    mysql_to_spark_type,
    resolve_spark_type,
    varchar_length,
)


# ---- type mapping (redshift.go:1202-1262, redshift_test.go) ----

@pytest.mark.parametrize(
    "mysql,expected",
    [
        ("bigint", T.LongType()),
        ("bigint unsigned", T.DecimalType(20, 0)),
        ("int(11)", T.IntegerType()),
        ("integer unsigned", T.LongType()),
        ("mediumint", T.IntegerType()),
        ("smallint", T.ShortType()),
        ("tinyint(1)", T.ShortType()),
        ("bit", T.BooleanType()),
        ("bool", T.BooleanType()),
        ("date", T.DateType()),
        ("year", T.DateType()),
        ("time", T.StringType()),
        ("datetime", T.TimestampNTZType()),
        ("timestamp", T.TimestampNTZType()),
        ("decimal(10,4)", T.DecimalType(10, 4)),
        ("numeric(39,38)", T.DecimalType(38, 37)),  # clamps (redshift.go:1274-1294)
        ("double", T.DoubleType()),
        ("float", T.FloatType()),
        ("varchar(255)", T.StringType()),
        ("text", T.StringType()),
        ("longtext", T.StringType()),
        ("blob", T.StringType()),
        ("json", T.StringType()),
        ("enum('A','B')", T.StringType()),
        ("polygon", T.StringType()),
    ],
)
def test_mysql_type_map(mysql, expected):
    assert mysql_to_spark_type(mysql) == expected


def test_mysql_enum_with_values():
    # enum('SELF','FATHER',...) — base type parse must survive the value list
    assert mysql_to_spark_type("enum") == T.StringType()


def test_source_type_precedence_and_masked_override():
    # source type beats Avro type (redshift.go:1376-1393)
    assert resolve_spark_type("string", "datetime") == T.TimestampNTZType()
    assert resolve_spark_type("int", None) == T.IntegerType()
    # masked columns → string digest regardless (redshift.go:1347-1354)
    assert resolve_spark_type("int", "bigint", masked=True) == T.StringType()


def test_varchar_length_rules():
    # applyLength: ×4 ratio, clamp 65535, masked pins to 50 (redshift.go:26-48,1264-1366)
    assert varchar_length(255) == 1020
    assert varchar_length(20000) == 65535
    assert varchar_length(None) == 256
    assert varchar_length(255, masked=True) == 50


# ---- bigint unsigned → decimal(20,0) (redshift.go:1215-1262) ----

def test_bigint_unsigned_decimal():
    t = mysql_to_spark_type("bigint(20) unsigned")
    assert t == T.DecimalType(20, 0)


# ---- temporal goldens (debezium/message_test.go:7-116) ----

def test_temporal_goldens(spark):
    df = spark.createDataFrame([Row(days=6807, neg_days=-13023, ms=588175262000,
                                    ms2=588175262230, us=588175262123456,
                                    time_us=39600000000, ms3=1602736317708,
                                    iso="2020-10-15T04:31:57Z")])
    out = df.select(
        debezium_date(F.col("days")).cast("string").alias("d1"),
        debezium_date(F.col("neg_days")).cast("string").alias("d2"),
        format_datetime(debezium_datetime_millis(F.col("ms")), 0).alias("t1"),
        format_datetime(debezium_datetime_millis(F.col("ms2")), 2).alias("t2"),
        format_datetime(debezium_datetime_micros(F.col("us")), 6).alias("t3"),
        debezium_time_micros(F.col("time_us")).alias("tm"),
        format_datetime(debezium_datetime_millis(F.col("ms3")), 3).alias("t4"),
        debezium_timestamp_iso(F.col("iso")).alias("ts"),
    ).collect()[0]
    assert out["d1"] == "1988-08-21"
    assert out["d2"] == "1934-05-07"
    assert out["t1"] == "1988-08-21 14:01:02"
    assert out["t2"] == "1988-08-21 14:01:02.23"
    assert out["t3"] == "1988-08-21 14:01:02.123456"
    assert out["tm"] == "11:00:00"
    assert out["t4"] == "2020-10-15 04:31:57.708"
    assert out["ts"] == "2020-10-15 04:31:57"


# ---- schema diff / migration planner (redshift.go:988-1190) ----

def make_table(cols):
    return Table("t", cols)


def test_diff_add_column():
    inc = make_table([ColInfo("id", "int", primary_key=True), ColInfo("loyalty_tier")])
    tgt = make_table([ColInfo("id", "int", primary_key=True)])
    ops = diff_schemas(inc, tgt)
    assert [o.kind for o in ops] == [MigrationKind.ADD_COLUMN]
    assert not plan_requires_rebuild(ops)


def test_diff_type_change_requires_rebuild():
    inc = make_table([ColInfo("id", "long", primary_key=True)])
    tgt = make_table([ColInfo("id", "int", primary_key=True)])
    ops = diff_schemas(inc, tgt)
    assert [o.kind for o in ops] == [MigrationKind.TYPE_CHANGE]
    assert plan_requires_rebuild(ops)


def test_diff_pk_and_distkey_change():
    inc = make_table([ColInfo("id", "int", primary_key=True, dist_key=True), ColInfo("v")])
    tgt = make_table([ColInfo("id", "int"), ColInfo("v", dist_key=True)])
    kinds = {o.kind for o in diff_schemas(inc, tgt)}
    assert MigrationKind.PRIMARY_KEY_CHANGE in kinds
    assert MigrationKind.DISTKEY_CHANGE in kinds


def test_diff_drop_and_sortkey():
    inc = make_table([ColInfo("id", "int", sort_ordinal=1)])
    tgt = make_table([ColInfo("id", "int"), ColInfo("zombie")])
    kinds = {o.kind for o in diff_schemas(inc, tgt)}
    assert kinds == {MigrationKind.DROP_COLUMN, MigrationKind.ALTER_SORTKEY}


def test_physical_layout_hints(spark):
    t = make_table([
        ColInfo("id", "int", primary_key=True, dist_key=True),
        ColInfo("created_at", "long", source_column_type="datetime", sort_ordinal=1),
    ])
    assert t.primary_keys == ["id"]
    assert t.dist_key == "id"
    assert t.sort_keys == ["created_at"]
    struct = t.to_struct_type()
    assert struct["created_at"].dataType == T.TimestampNTZType()
    df = spark.createDataFrame([Row(id=1, created_at=None)], struct)
    assert t.apply_physical_layout(df, num_partitions=4).rdd.getNumPartitions() == 4
