"""SchemaParser: type strings and CREATE TABLE DDL -> Spark types.

Parity targets: reference ``schema_parser.py:40-256`` (type grammar),
``:363-395`` (parseCreateTable), ``:223-224`` (interval rejection).
"""

import pytest
from pyspark.sql import types as T

from dbldatagen_spark import DataGenerator, SchemaParser


@pytest.mark.parametrize(
    "text,expected",
    [
        ("int", T.IntegerType()),
        ("bigint", T.LongType()),
        ("long", T.LongType()),
        ("string", T.StringType()),
        ("text", T.StringType()),
        ("bool", T.BooleanType()),
        ("boolean", T.BooleanType()),
        ("smallint", T.ShortType()),
        ("tinyint", T.ByteType()),
        ("binary", T.BinaryType()),
        ("date", T.DateType()),
        ("timestamp", T.TimestampType()),
        ("datetime", T.TimestampType()),
        ("float", T.FloatType()),
        ("double", T.DoubleType()),
        ("decimal(10,2)", T.DecimalType(10, 2)),
        ("number(12, 4)", T.DecimalType(12, 4)),
        ("numeric(5,0)", T.DecimalType(5, 0)),
        ("varchar(20)", T.VarcharType(20)),
        ("char(3)", T.CharType(3)),
        ("array<int>", T.ArrayType(T.IntegerType())),
        ("map<string,double>", T.MapType(T.StringType(), T.DoubleType())),
        (
            "struct<a:int,b:array<string>>",
            T.StructType(
                [
                    T.StructField("a", T.IntegerType()),
                    T.StructField("b", T.ArrayType(T.StringType())),
                ]
            ),
        ),
        (
            "array<struct<x:number(10,2)>>",
            T.ArrayType(
                T.StructType([T.StructField("x", T.DecimalType(10, 2))])
            ),
        ),
    ],
)
def test_column_type_from_string(spark, text, expected):
    assert SchemaParser.columnTypeFromString(text) == expected


def test_interval_rejected(spark):
    with pytest.raises(ValueError, match="interval"):
        SchemaParser.columnTypeFromString("interval")
    with pytest.raises(ValueError, match="interval"):
        SchemaParser.parseCreateTable(
            spark, "CREATE TABLE t (a int, b interval)"
        )


def test_bad_type_string(spark):
    with pytest.raises(ValueError):
        SchemaParser.columnTypeFromString("not a type!!")
    with pytest.raises(ValueError):
        SchemaParser.columnTypeFromString("")


def test_parse_create_table_basic(spark):
    schema = SchemaParser.parseCreateTable(
        spark,
        """CREATE TABLE customer (
            id bigint NOT NULL,
            name string,
            balance decimal(12,2),
            tags array<string>
        ) USING delta LOCATION '/tmp/x'""",
    )
    assert [f.name for f in schema.fields] == ["id", "name", "balance", "tags"]
    assert schema["balance"].dataType == T.DecimalType(12, 2)
    assert schema["tags"].dataType == T.ArrayType(T.StringType())


def test_parse_create_table_variants(spark):
    for stmt in [
        "create table if not exists db.t (`a` int, b datetime)",
        "CREATE OR REPLACE TABLE t(a int, b datetime)",
        "CREATE TEMPORARY TABLE t (a int, b datetime) TBLPROPERTIES ('x'='y')",
    ]:
        schema = SchemaParser.parseCreateTable(spark, stmt)
        assert [f.name for f in schema.fields] == ["a", "b"]
        assert schema["b"].dataType == T.TimestampType()


def test_parse_create_table_errors(spark):
    with pytest.raises(ValueError):
        SchemaParser.parseCreateTable(spark, "SELECT 1")
    with pytest.raises(ValueError):
        SchemaParser.parseCreateTable(spark, "")
    with pytest.raises(ValueError):
        SchemaParser.parseCreateTable(spark, "CREATE TABLE t ()")


def test_roundtrip_into_generator(spark):
    """parseCreateTable feeds withSchema: implicit specs generate data."""
    schema = SchemaParser.parseCreateTable(
        spark, "CREATE TABLE t (code int, label string, ts timestamp)"
    )
    df = (
        DataGenerator(spark, name="ddl", rows=100, partitions=4)
        .withSchema(schema)
        .withColumnSpecs(patterns="code", minValue=1, maxValue=9)
        .build()
    )
    assert df.columns == ["code", "label", "ts"]
    from pyspark.sql import functions as F

    lo, hi = df.agg(F.min("code"), F.max("code")).first()
    assert 1 <= lo and hi <= 9


def test_complex_types_null_default_and_expr(spark):
    """array/map/struct columns: NULL without expr/values, populated with
    expr (reference column_generation_spec.py:1410-1412,1444-1445)."""
    df = (
        DataGenerator(spark, name="cx", rows=50, partitions=2)
        .withColumn("bare_arr", "array<int>")
        .withColumn("bare_map", "map<string,int>")
        .withColumn("arr", "array<string>", expr="array(string(id % 3))")
        .withColumn(
            "st", "struct<a:int,b:string>",
            expr="named_struct('a', int(id % 7), 'b', 'x')",
        )
        .build()
    )
    assert df.schema["bare_arr"].dataType == T.ArrayType(T.IntegerType())
    assert df.schema["bare_map"].dataType == T.MapType(
        T.StringType(), T.IntegerType()
    )
    assert df.schema["st"].dataType == T.StructType(
        [T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())]
    )
    row = df.first()
    assert row["bare_arr"] is None and row["bare_map"] is None
    assert row["arr"] == ["0"] and row["st"]["b"] == "x"
