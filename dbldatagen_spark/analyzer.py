"""DataAnalyzer: profile an existing DataFrame and generate spec code.

Reference surface: ``/root/reference/dbldatagen/data_analyzer.py:25-527``
(stacked summary via selectExpr+union, code generation from schema/data).
Implementation original.

``summarize_to_df`` computes the whole profile in **one** aggregation pass
(every measure is a column aggregate in a single ``agg``), then unpivots
driver-side — on 100 TB that is one scan + one reduce, versus the
reference's per-measure union of scans.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


_MEASURES = ("count", "null_count", "distinct_count", "min", "max", "mean",
             "stddev", "min_length", "max_length")


def summarize_to_df(df: DataFrame, max_distinct: int = 1_000_000) -> DataFrame:
    """Stacked summary: one row per measure, one column per source column
    (plus ``measure``/``summary`` bookkeeping columns), all strings."""
    spark = df.sparkSession
    cols = df.columns
    aggs = []
    for c in cols:
        col = F.col(c)
        is_num = isinstance(
            df.schema[c].dataType,
            (T.NumericType,),
        )
        is_str = isinstance(df.schema[c].dataType, T.StringType)
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__count"),
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"{c}__null_count"),
            F.approx_count_distinct(col).alias(f"{c}__distinct_count"),
            F.min(col).cast("string").alias(f"{c}__min"),
            F.max(col).cast("string").alias(f"{c}__max"),
            (F.avg(col.cast("double")) if is_num else F.lit(None).cast("double")).alias(f"{c}__mean"),
            (F.stddev(col.cast("double")) if is_num else F.lit(None).cast("double")).alias(f"{c}__stddev"),
            (F.min(F.length(col)) if is_str else F.lit(None).cast("int")).alias(f"{c}__min_length"),
            (F.max(F.length(col)) if is_str else F.lit(None).cast("int")).alias(f"{c}__max_length"),
        ]
    row = df.agg(*aggs).first()
    out_rows = []
    for m in _MEASURES:
        out_rows.append(
            tuple(["summary", m] + [str(row[f"{c}__{m}"]) if row[f"{c}__{m}"] is not None else None for c in cols])
        )
    schema = T.StructType(
        [T.StructField("summary", T.StringType()), T.StructField("measure", T.StringType())]
        + [T.StructField(c, T.StringType()) for c in cols]
    )
    return spark.createDataFrame(out_rows, schema)


class DataAnalyzer:
    """Profile a DataFrame; emit equivalent generator source code."""

    def __init__(self, sparkSession: Optional[SparkSession] = None,
                 df: Optional[DataFrame] = None):
        self.spark = sparkSession or (df.sparkSession if df is not None else None)
        self.df = df

    def summarizeToDF(self) -> DataFrame:
        if self.df is None:
            raise ValueError("DataAnalyzer requires a DataFrame")
        return summarize_to_df(self.df)

    def summarize(self) -> str:
        rows = self.summarizeToDF().collect()
        lines = ["Data set summary", "================"]
        for r in rows:
            lines.append(str(r.asDict()))
        return "\n".join(lines)

    @staticmethod
    def scriptDataGeneratorFromSchema(
        schema: T.StructType, name: str = "synthetic_data", rows: int = 100000
    ) -> str:
        """Emit Python source constructing a DataGenerator matching the
        schema, with per-type starter options."""
        lines = [
            "import dbldatagen_spark as dg",
            "",
            "generation_spec = (",
            f"    dg.DataGenerator(sparkSession=spark, name={name!r}, rows={rows})",
        ]
        for f in schema.fields:
            dt = f.dataType.simpleString()
            if isinstance(f.dataType, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
                opt = "minValue=1, maxValue=1000000"
            elif isinstance(f.dataType, (T.FloatType, T.DoubleType, T.DecimalType)):
                opt = "minValue=0.0, maxValue=1000.0, random=True"
            elif isinstance(f.dataType, T.DateType):
                opt = "begin='2020-01-01', end='2024-12-31', random=True"
            elif isinstance(f.dataType, T.TimestampType):
                opt = ("begin='2020-01-01 00:00:00', end='2024-12-31 23:59:59', "
                       "random=True")
            elif isinstance(f.dataType, T.BooleanType):
                opt = "values=[True, False], random=True"
            else:
                opt = "template=r'\\w'"
            lines.append(f"    .withColumn({f.name!r}, {dt!r}, {opt})")
        lines.append(")")
        return "\n".join(lines)

    @staticmethod
    def _bounded_distinct(df: DataFrame, col: str, cap: int = 20):
        """Distinct values of ``col`` with PROVABLY bounded driver
        traffic: the ``approx_count_distinct <= cap`` gate that routes
        here can undercount, so collect at most ``cap + 1`` rows and
        return ``None`` (caller falls back to a range/template spec)
        when the true cardinality exceeds the cap."""
        rows = df.select(col).distinct().orderBy(col).limit(cap + 1).collect()
        if len(rows) > cap:
            return None
        return [r[0] for r in rows]

    def scriptDataGeneratorFromData(self, name: str = "synthetic_data") -> str:
        """Like ``scriptDataGeneratorFromSchema`` but bounds numeric/temporal
        options by the observed min/max and flags low-cardinality string
        columns as value lists."""
        if self.df is None:
            raise ValueError("DataAnalyzer requires a DataFrame")
        df = self.df
        schema = df.schema
        stats: Dict[str, Dict[str, str]] = {}
        summary = self.summarizeToDF().collect()
        by_measure = {r.measure: r for r in summary}
        n_rows = int(by_measure["count"][df.columns[0]])
        lines = [
            "import dbldatagen_spark as dg",
            "",
            "generation_spec = (",
            f"    dg.DataGenerator(sparkSession=spark, name={name!r}, rows={n_rows})",
        ]
        for f in schema.fields:
            c = f.name
            dt = f.dataType.simpleString()
            mn = by_measure["min"][c]
            mx = by_measure["max"][c]
            distinct = int(by_measure["distinct_count"][c] or 0)
            if isinstance(f.dataType, T.NumericType):
                opt = f"minValue={mn}, maxValue={mx}, random=True"
                if 0 < distinct <= 20:
                    vals = self._bounded_distinct(df, c)
                    if vals is not None:
                        opt = f"values={vals!r}, random=True"
            elif isinstance(f.dataType, T.TimestampType):
                opt = f"begin='{mn}', end='{mx}', random=True"
            elif isinstance(f.dataType, T.DateType):
                opt = f"begin='{mn}', end='{mx}', random=True"
            elif isinstance(f.dataType, T.StringType) and 0 < distinct <= 20:
                vals = self._bounded_distinct(df, c)
                opt = (
                    f"values={vals!r}, random=True"
                    if vals is not None
                    else "template=r'\\w'"
                )
            else:
                opt = "template=r'\\w'"
            lines.append(f"    .withColumn({c!r}, {dt!r}, {opt})")
        lines.append(")")
        return "\n".join(lines)
