"""M8 surfaces: serialization, datasets registry, analyzer, streaming, sinks."""

import hashlib
import os
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from dbldatagen_spark import (
    ColumnSpec,
    DataGenPlan,
    DataGenerator,
    ForeignKeyColumn,
    Normal,
    PatternColumn,
    RangeColumn,
    SequenceColumn,
    StructColumn,
    TableSpec,
    TimestampColumn,
    ValuesColumn,
    WeightedValues,
    generate,
    generate_table,
)


def fingerprint(df):
    rows = sorted(tuple(str(x) for x in r) for r in df.collect())
    return hashlib.md5(repr(rows).encode()).hexdigest()


class TestSerialization:
    def plan(self):
        return DataGenPlan(
            [
                TableSpec(
                    "customers", 100,
                    columns=[
                        ColumnSpec("customer_id", SequenceColumn(start=1, step=1), dtype="long"),
                        ColumnSpec("name", ValuesColumn(["Alice", "Bob"], WeightedValues([3, 1]))),
                        ColumnSpec("signup", TimestampColumn("2022-01-01 00:00:00", "2024-12-31 23:59:59")),
                        ColumnSpec(
                            "address",
                            StructColumn([
                                ColumnSpec("city", ValuesColumn(["Springfield", "Rivertown"])),
                                ColumnSpec("zip", PatternColumn("{digit:5}")),
                            ]),
                        ),
                    ],
                    primary_key="customer_id",
                ),
                TableSpec(
                    "orders", 500,
                    columns=[
                        ColumnSpec("order_id", SequenceColumn(), dtype="long"),
                        ColumnSpec("customer_id", ForeignKeyColumn("customers.customer_id")),
                        ColumnSpec("amount", RangeColumn(1.0, 100.0, distribution=Normal()), dtype="double"),
                    ],
                    primary_key="order_id",
                ),
            ],
            seed=42,
        )

    def test_json_round_trip_identical_data(self, spark, tmp_path):
        from dbldatagen_spark.plans.serialization import load_plan_json, save_plan_json

        p1 = self.plan()
        path = str(tmp_path / "plan.json")
        save_plan_json(p1, path)
        p2 = load_plan_json(path)
        d1 = generate(spark, p1)
        d2 = generate(spark, p2)
        for name in d1:
            assert fingerprint(d1[name]) == fingerprint(d2[name])

    def test_dict_round_trip_equality(self):
        from dbldatagen_spark.plans.serialization import plan_from_dict, plan_to_dict

        p1 = self.plan()
        assert plan_to_dict(plan_from_dict(plan_to_dict(p1))) == plan_to_dict(p1)


class TestDatasets:
    def test_list_and_describe(self):
        from dbldatagen_spark.datasets import Datasets

        names = {d["name"] for d in Datasets.list()}
        assert {"basic/user", "basic/telephony", "benchmark/groupby",
                "multi_table/sales_order"} <= names
        desc = Datasets.describe("benchmark/groupby")
        assert "groupby" in desc["name"]

    def test_basic_user_build(self, spark):
        from dbldatagen_spark.datasets import Datasets

        df = Datasets(spark, "basic/user").get(rows=500).build()
        assert df.count() == 500
        assert df.where(~F.col("ip_addr").rlike(r"^\d+\.\d+\.\d+\.\d+$")).count() == 0

    def test_benchmark_groupby_cardinality(self, spark):
        from dbldatagen_spark.datasets import Datasets

        df = Datasets(spark, "benchmark/groupby").get(rows=20000, groups=50).build()
        assert df.select(F.countDistinct("id1")).first()[0] == 50
        assert set(df.columns) == {"id1", "id2", "id3", "id4", "id5", "id6", "v1", "v2", "v3"}

    def test_multi_table_sales_order(self, spark):
        from dbldatagen_spark.datasets import Datasets

        ds = Datasets(spark, "multi_table/sales_order")
        orders = ds.get(table="base_orders", rows=1000).build()
        customers = ds.get(table="customers", rows=1000, numCustomers=50).build()
        assert orders.count() == 1000
        # FK values land inside the customer key range
        assert orders.agg(F.max("customer_id")).first()[0] <= 50

    def test_unknown_dataset(self, spark):
        from dbldatagen_spark.datasets import Datasets

        with pytest.raises(ValueError):
            Datasets(spark, "nope/nothing")


class TestAnalyzer:
    def test_summarize(self, spark):
        from dbldatagen_spark.analyzer import DataAnalyzer

        df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
        summary = DataAnalyzer(df=df).summarizeToDF().collect()
        by_measure = {r.measure: r for r in summary}
        assert int(by_measure["count"]["c_custkey"]) == df.count()
        assert int(by_measure["null_count"]["c_name"]) == 0
        assert by_measure["min"]["c_custkey"] == "0"

    def test_script_from_schema(self, spark):
        from dbldatagen_spark.analyzer import DataAnalyzer

        df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
        code = DataAnalyzer.scriptDataGeneratorFromSchema(df.schema)
        assert "withColumn('c_custkey', 'bigint'" in code
        assert "dg.DataGenerator" in code

    def test_script_from_data_roundtrips(self, spark):
        from dbldatagen_spark.analyzer import DataAnalyzer

        df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
        code = DataAnalyzer(df=df).scriptDataGeneratorFromData()
        # the generated code must be executable and produce the same schema
        import dbldatagen_spark as dg

        env = {"dg": dg, "spark": spark}
        exec(code, env)
        out = env["generation_spec"].build()
        assert set(out.columns) == set(df.columns)

    def test_bounded_distinct_guard(self, spark):
        # the approx_count_distinct <= 20 gate can undercount; the
        # collect must still be provably bounded (limit cap+1) and fall
        # back to a range spec when the true cardinality exceeds the cap
        from dbldatagen_spark.analyzer import DataAnalyzer

        wide = spark.range(1000).selectExpr("id AS v")
        assert DataAnalyzer._bounded_distinct(wide, "v") is None
        narrow = spark.range(100).selectExpr("id % 7 AS v")
        assert DataAnalyzer._bounded_distinct(narrow, "v") == list(range(7))


class TestStreaming:
    def test_rate_source_build_and_write(self, spark, tmp_path):
        from dbldatagen_spark.streaming import build_streaming, run_stream_until_rows

        gen = (
            DataGenerator(spark, name="stream1", rows=1000, partitions=2, randomSeed=42)
            .withIdOutput()
            .withColumn("code1", "int", minValue=100, maxValue=200)
            .withColumn("v", "string", values=["a", "b", "c"], random=True)
        )
        sdf = build_streaming(gen, rows_per_second=500)
        assert sdf.isStreaming
        out_dir = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        run_stream_until_rows(sdf, out_dir, ckpt, min_rows=50)
        got = spark.read.parquet(out_dir)
        assert got.count() > 0
        assert set(got.columns) == {"id", "code1", "v"}
        # streaming rows equal batch rows at the same ids (same seed fn)
        batch = gen.build().where(F.col("id").isin([r.id for r in got.limit(20).collect()]))
        joined = got.alias("s").join(batch.alias("b"), "id").where(
            (F.col("s.code1") != F.col("b.code1")) | (F.col("s.v") != F.col("b.v"))
        )
        assert joined.count() == 0

    def test_streaming_schema_matches_batch(self, spark):
        gen = (
            DataGenerator(spark, name="stream2", rows=100, partitions=2)
            .withColumn("x", "int", minValue=0, maxValue=9)
            .withColumn("t", "timestamp", begin="2024-01-01 00:00:00",
                        end="2024-12-31 23:59:59", random=True)
        )
        batch_schema = gen.build().schema
        stream_schema = gen.build(withStreaming=True, options={"rowsPerSecond": 10}).schema
        assert batch_schema == stream_schema


class TestSinks:
    def test_batch_write(self, spark, tmp_path):
        from dbldatagen_spark.sources.sinks import OutputDataset, write_data_to_output

        t = TableSpec(
            "sink_t", 100,
            columns=[ColumnSpec("x", SequenceColumn(), dtype="long")],
        )
        df = generate_table(spark, t, seed=1)
        path = str(tmp_path / "data")
        write_data_to_output(
            df, OutputDataset(location=path, output_format="parquet", mode="overwrite")
        )
        assert spark.read.parquet(path).count() == 100

    def test_bad_trigger_rejected(self):
        from dbldatagen_spark.sources.sinks import OutputDataset

        with pytest.raises(ValueError):
            OutputDataset(location="/tmp/x", trigger={"continuous": "1 second"})

    def test_location_or_table_required(self):
        from dbldatagen_spark.sources.sinks import OutputDataset

        with pytest.raises(ValueError):
            OutputDataset()


class TestExtendedProviders:
    def test_all_registered_providers_build(self, spark):
        from dbldatagen_spark.datasets.registry import Datasets

        names = {d["name"] for d in Datasets.list()}
        for expected in [
            "basic/user", "basic/telephony", "basic/geometries",
            "basic/process_historian", "basic/stock_ticker",
            "basic/telematics", "benchmark/groupby",
            "multi_table/sales_order", "multi_table/telephony",
        ]:
            assert expected in names
        for name in ["basic/geometries", "basic/process_historian",
                     "basic/stock_ticker", "basic/telematics"]:
            df = Datasets(spark, name).get(rows=200).build()
            assert df.count() == 200

    def test_geometry_wkt_forms(self, spark):
        from pyspark.sql import functions as F

        from dbldatagen_spark.datasets.registry import Datasets

        for gtype, prefix in [
            ("point", "POINT("),
            ("lineString", "LINESTRING("),
            ("polygon", "POLYGON(("),
        ]:
            df = (
                Datasets(spark, "basic/geometries")
                .get(rows=50, geometryType=gtype)
                .build()
            )
            assert df.where(~F.col("wkt").startswith(prefix)).count() == 0

    def test_stock_ticker_ohlc_invariants(self, spark):
        from pyspark.sql import functions as F

        from dbldatagen_spark.datasets.registry import Datasets

        df = Datasets(spark, "basic/stock_ticker").get(rows=500, numSymbols=25).build()
        bad = df.where(
            (F.col("high") < F.col("open")) | (F.col("high") < F.col("close"))
            | (F.col("low") > F.col("open")) | (F.col("low") > F.col("close"))
            | (F.col("open") < 0) | (F.col("close") < 0)
        ).count()
        assert bad == 0
        assert df.select("symbol").distinct().count() == 25

    def test_telephony_fk_alignment(self, spark):
        from pyspark.sql import functions as F

        from dbldatagen_spark.datasets.registry import Datasets

        ds = Datasets(spark, "multi_table/telephony")
        plans = ds.get(table="plans", rows=100).build()
        customers = ds.get(table="customers", rows=200).build()
        events = ds.get(table="device_events", rows=200).build()
        orphan_plan = customers.join(
            F.broadcast(plans.select("plan_id")), "plan_id", "left_anti"
        ).count()
        orphan_cust = events.join(
            F.broadcast(customers.select("customer_id")), "customer_id", "left_anti"
        ).count()
        assert orphan_plan == 0 and orphan_cust == 0


def test_bucketed_write_enables_shuffle_free_join(spark, tmp_path):
    import uuid

    from pyspark.sql import functions as F

    from dbldatagen_spark.sources.sinks import OutputDataset, write_data_to_output

    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    tag = uuid.uuid4().hex[:8]
    ta, tb = f"bk_a_{tag}", f"bk_b_{tag}"
    a = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    try:
        write_data_to_output(
            a,
            OutputDataset(table=ta, mode="overwrite", bucket_by=(8, ["k"]), sort_by=["k"]),
        )
        write_data_to_output(
            b,
            OutputDataset(table=tb, mode="overwrite", bucket_by=(8, ["k"]), sort_by=["k"]),
        )
        # force a sort-merge join (AQE would broadcast these tiny tables);
        # bucketing must make it shuffle-free
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table(ta).join(spark.table(tb), "k")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange hashpartitioning" not in plan, plan
            assert joined.count() == 1000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_bucket_by_validation():
    import pytest

    from dbldatagen_spark.sources.sinks import OutputDataset

    with pytest.raises(ValueError, match="requires a table"):
        OutputDataset(location="/tmp/x", bucket_by=(4, ["k"]))
    with pytest.raises(ValueError, match="sort_by requires bucket_by"):
        OutputDataset(table="t", sort_by=["k"])


def test_range_partitioned_write_prunes_files(spark, tmp_path):
    """range_partition_by lays files out in contiguous key ranges: a
    point filter's parquet footer pruning then skips most files (checked
    via per-file key min/max disjointness)."""
    import pyarrow.parquet as pq

    from dbldatagen_spark.sources.sinks import OutputDataset, write_data_to_output

    df = spark.range(10000).selectExpr("id AS k", "id % 7 AS v").repartition(8)
    path = str(tmp_path / "ranged")
    write_data_to_output(
        df,
        OutputDataset(
            location=path,
            mode="overwrite",
            range_partition_by=["k"],
            sort_within_files=True,
            range_partitions=6,
        ),
    )
    import glob
    files = sorted(glob.glob(f"{path}/*.parquet"))
    assert len(files) > 1
    spans = []
    for f in files:
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        spans.append((min(mins), max(maxs)))
    spans.sort()
    # contiguous, non-overlapping key ranges across files
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2
    # round-trip integrity
    back = spark.read.parquet(path)
    assert back.count() == 10000
    assert back.agg({"k": "max"}).first()[0] == 9999


def test_range_partition_validation(spark):
    from dbldatagen_spark.sources.sinks import OutputDataset

    import pytest as _pytest

    with _pytest.raises(ValueError):
        OutputDataset(location="/tmp/x", sort_within_files=True)
    with _pytest.raises(ValueError):
        OutputDataset(
            table="t", bucket_by=(4, ["k"]), range_partition_by=["k"]
        )
