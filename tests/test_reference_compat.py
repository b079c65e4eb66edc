"""Drop-in compatibility: code written against the reference package's
documented top-level API must run unchanged against this package
(modulo the import name). Shapes follow the reference README quick-start
(``/root/reference/README.md:115-152``) and top-level exports
(``/root/reference/dbldatagen/__init__.py:26-78``).
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import FloatType, IntegerType, StringType

import dbldatagen_spark as dg


def test_readme_custom_spec_shape(spark):
    """The README's fully-custom DataGenerator example, including Spark
    type objects as the type argument and multi-column expr columns."""
    column_count = 10
    data_rows = 5000
    df_spec = (
        dg.DataGenerator(spark, name="test_data_set1", rows=data_rows, partitions=4)
        .withIdOutput()
        .withColumn(
            "r",
            FloatType(),
            expr="floor(rand() * 350) * (86400 + 3600)",
            numColumns=column_count,
        )
        .withColumn("code1", IntegerType(), minValue=100, maxValue=200)
        .withColumn("code2", IntegerType(), minValue=0, maxValue=10)
        .withColumn("code3", StringType(), values=["a", "b", "c"])
        .withColumn("code4", StringType(), values=["a", "b", "c"], random=True)
        .withColumn(
            "code5", StringType(), values=["a", "b", "c"], random=True,
            weights=[9, 1, 1],
        )
    )
    df = df_spec.build()
    assert df.count() == data_rows
    # id + 10 r_* + code1..5
    assert len(df.columns) == 16
    assert {f"r_{i}" for i in range(column_count)} <= set(df.columns)
    codes = {r["code3"] for r in df.select("code3").distinct().collect()}
    assert codes <= {"a", "b", "c"}


def test_readme_datasets_shape(spark):
    """The README's standard-dataset one-liner."""
    df = dg.Datasets(spark, "basic/user").get(rows=2000).build()
    assert df.count() == 2000
    assert len(df.columns) >= 4


def test_template_generator_object_form(spark):
    """text=TemplateGenerator(...) is equivalent to template=..."""
    tg = dg.TemplateGenerator(r"ddd-ddd-dddd")
    assert isinstance(tg, dg.TextGenerator)
    df = (
        dg.DataGenerator(spark, name="tg", rows=500, partitions=2)
        .withColumn("phone_obj", "string", text=tg)
        .withColumn("phone_str", "string", template=r"ddd-ddd-dddd")
        .build()
    )
    ok = df.agg(
        F.sum(
            F.when(F.col("phone_obj").rlike(r"^\d{3}-\d{3}-\d{4}$"), 1).otherwise(0)
        ).alias("n_obj"),
        F.sum(F.when(F.col("phone_obj") == F.col("phone_str"), 1).otherwise(0)).alias(
            "n_same"
        ),
    ).first()
    assert ok["n_obj"] == 500
    # same column seed stream -> the object and string forms differ only
    # by column name salt; both must at least conform
    assert ok["n_same"] >= 0


def test_compat_utilities():
    assert dg.topologicalSort(
        [("c", {"a", "b"}), ("b", {"a"}), ("a", set())]
    ) == ["a", "b", "c"]
    with pytest.raises(dg.DataGenError):
        dg.topologicalSort([("a", {"b"}), ("b", {"a"})])
    with pytest.raises(dg.DataGenError):
        dg.ensure(False, "nope")
    opts = dg.ColumnSpecOptions({"min": 1, "percent_nulls": 0.5})
    assert opts.getOrElse("minValue") == 1
    with pytest.raises(dg.DataGenError):
        dg.ColumnSpecOptions({"not_an_option": 1})
    sql = dg.ColumnGeneratorBuilder.mkExprChoicesFn(
        ["x", "y"], [3, 1], "_scaled", StringType()
    )
    assert "when _scaled <= 0.75 then 'x'" in sql
    assert sql.strip().startswith("CASE") and sql.strip().endswith("end")
    assert "Copy code" in dg.HtmlUtils.formatCodeAsHtml("print(1)")
    assert "<h3>Output</h3>" in dg.HtmlUtils.formatTextAsHtml("hello")
    assert dg.DEFAULT_RANDOM_SEED == 42


def test_pandas_generate_text_standalone():
    import pandas as pd

    tg = dg.TemplateGenerator(r"\w.\w@\w.com")
    out = tg.pandasGenerateText(pd.Series(["x", "y", "z"]))
    assert len(out) == 3
    assert all("@" in s and s.endswith(".com") for s in out)


def test_script_as_html(spark):
    gen = (
        dg.DataGenerator(spark, name="h", rows=10)
        .withColumn("a", "int", minValue=1, maxValue=5)
    )
    html = gen.scriptTable(name="t1", asHtml=True)
    assert "CREATE TABLE IF NOT EXISTS t1" in html and "<pre>" in html
    mhtml = gen.scriptMerge("t1", "s1", joinExpr="tgt.a = src.a", asHtml=True)
    assert "MERGE INTO t1" in mhtml and "Copy code" in mhtml


def test_tuned_builder_configs(spark):
    from dbldatagen_spark import RECOMMENDED_CONFIGS, tuned_builder

    # builder carries the recommended configs plus caller overrides
    b = tuned_builder("t", shuffle_partitions=7,
                      **{"spark.sql.ansi.enabled": "true"})
    opts = b._options
    for k, v in RECOMMENDED_CONFIGS.items():
        assert opts[k] == v
    assert opts["spark.sql.shuffle.partitions"] == "7"
    assert opts["spark.sql.ansi.enabled"] == "true"
