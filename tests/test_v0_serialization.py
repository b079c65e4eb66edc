"""v0 generator JSON round-trip + text-generator objects + NRange/DateRange."""

import hashlib

import pytest
from pyspark.sql import functions as F

from dbldatagen_spark import (
    DataGenerator,
    DateRange,
    FakerText,
    ILText,
    NRange,
    PositiveValues,
    UniqueCombinations,
    fakerText,
)


def fingerprint(df):
    rows = sorted(tuple(str(x) for x in r) for r in df.collect())
    return hashlib.md5(repr(rows).encode()).hexdigest()


def mk(spark):
    return (
        DataGenerator(spark, name="ser1", rows=500, partitions=3, randomSeed=11)
        .withIdOutput()
        .withColumn("a", "int", minValue=1, maxValue=100, random=True)
        .withColumn("b", "string", values=["x", "y", "z"], weights=[5, 3, 2], random=True)
        .withColumn("c", "string", template=r"\wAA-ddd")
        .withColumn("d", "string", text=ILText(paragraphs=1, sentences=(1, 2), words=(3, 5)))
        .withColumn("e", "string", text=fakerText("email"))
        .withColumn("f", "double", dataRange=NRange(0.0, 10.0, 0.5), random=True)
        .withColumn("g", "date", dataRange=DateRange("2021-01-01", "2021-12-31"), random=True)
        .withConstraint(PositiveValues("a"))
        .withConstraint(UniqueCombinations(["a", "b"]))
    )


class TestV0Serialization:
    def test_round_trip_identical_data(self, spark, tmp_path):
        gen = mk(spark)
        path = str(tmp_path / "gen.json")
        gen.saveToJson(path)
        gen2 = DataGenerator.loadFromJson(path, sparkSession=spark)
        assert fingerprint(gen.build()) == fingerprint(gen2.build())

    def test_pyfunc_not_serializable(self, spark, tmp_path):
        from dbldatagen_spark import PyfuncText
        from dbldatagen_spark.plans.spec import SpecValidationError

        gen = DataGenerator(spark, rows=10).withColumn(
            "t", "string", text=PyfuncText(lambda ctx, v: "x")
        )
        with pytest.raises(SpecValidationError):
            gen.saveToJson(str(tmp_path / "bad.json"))


class TestTextObjects:
    def test_iltext_shape(self, spark):
        df = (
            DataGenerator(spark, rows=100, partitions=2)
            .withColumn("txt", "string", text=ILText(paragraphs=(1, 2), sentences=(2, 3), words=(3, 6)))
            .build()
        )
        rows = df.collect()
        for r in rows[:20]:
            assert r.txt and r.txt[0].isupper()
            assert r.txt.count(".") >= 1

    def test_faker_text_email(self, spark):
        df = (
            DataGenerator(spark, rows=100, partitions=2)
            .withColumn("mail", "string", text=FakerText("email"))
            .build()
        )
        assert df.where(~F.col("mail").contains("@")).count() == 0

    def test_date_range_bounds(self, spark):
        df = (
            DataGenerator(spark, rows=500, partitions=2)
            .withColumn("g", "date", dataRange=DateRange("2021-01-01", "2021-12-31"), random=True)
            .build()
        )
        lo, hi = df.agg(F.min("g"), F.max("g")).first()
        assert str(lo) >= "2021-01-01" and str(hi) <= "2021-12-31"
