"""Robustness: ANSI-mode invariance, wide schemas, boundary ranges.

Mirrors the reference's test strategy (its core suite runs under an
``ansi_enabled`` toggle fixture and ships a ``test_large_schema`` scale
test) — generation here must produce identical bytes with ANSI on or
off, and wide specs must survive codegen limits via select batching.
"""

import pytest
from pyspark.sql import functions as F


def _fingerprint(df):
    return sorted(map(str, df.collect()))


@pytest.fixture()
def ansi_toggle(spark):
    orig = spark.conf.get("spark.sql.ansi.enabled")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", orig)


def _representative_df(spark, partitions=6):
    from dbldatagen_spark import (
        ColumnSpec,
        Normal,
        PatternColumn,
        RangeColumn,
        TableSpec,
        TimestampColumn,
        UUIDColumn,
        ValuesColumn,
        WeightedValues,
        Zipf,
        generate_table,
    )

    t = TableSpec(
        "ansi_t",
        3000,
        columns=[
            ColumnSpec("a", RangeColumn(-100, 100), dtype="int"),
            ColumnSpec("b", RangeColumn(0.0, 1.0, distribution=Normal()), dtype="double"),
            ColumnSpec("z", RangeColumn(0, 10**6, distribution=Zipf(1.3)), dtype="long"),
            ColumnSpec("w", ValuesColumn(["p", "q", "r"], WeightedValues([5, 3, 2]))),
            ColumnSpec("u", UUIDColumn()),
            ColumnSpec("pat", PatternColumn("X-{digit:6}-{hex:4}")),
            ColumnSpec("ts", TimestampColumn("2020-01-01 00:00:00", "2024-12-31 23:59:59")),
            ColumnSpec("dec", RangeColumn(0.0, 999.0), dtype="decimal(7,3)"),
        ],
        partitions=partitions,
    )
    return generate_table(spark, t, seed=17)


class TestAnsiInvariance:
    def test_generation_identical_under_ansi_toggle(self, ansi_toggle):
        spark = ansi_toggle
        spark.conf.set("spark.sql.ansi.enabled", "true")
        on = _fingerprint(_representative_df(spark))
        spark.conf.set("spark.sql.ansi.enabled", "false")
        off = _fingerprint(_representative_df(spark))
        assert on == off

    def test_v0_weighted_and_unique_under_ansi(self, ansi_toggle):
        from dbldatagen_spark import DataGenerator

        spark = ansi_toggle

        def build():
            return (
                DataGenerator(spark, name="av0", rows=2000, partitions=4)
                .withIdOutput()
                .withColumn("k", "long", minValue=1, maxValue=10**12,
                            uniqueValues=50000, random=True)
                .withColumn("w", "string", values=["a", "b"], weights=[9, 1],
                            random=True)
                .build()
            )

        spark.conf.set("spark.sql.ansi.enabled", "true")
        on = _fingerprint(build())
        spark.conf.set("spark.sql.ansi.enabled", "false")
        off = _fingerprint(build())
        assert on == off


class TestWideSchemas:
    def test_120_column_table_builds(self, spark):
        """Above spark.sql.codegen.maxFields (100) — select batching and
        codegen fallback must both cope."""
        from dbldatagen_spark import ColumnSpec, RangeColumn, TableSpec, generate_table

        cols = [
            ColumnSpec(f"c{i}", RangeColumn(0, 1000 + i), dtype="int")
            for i in range(120)
        ]
        t = TableSpec("wide", 500, columns=cols, partitions=4)
        df = generate_table(spark, t, seed=5)
        assert len(df.columns) == 120
        assert df.count() == 500
        # spot-check determinism of the widest column
        r1 = df.agg(F.sum("c119")).first()[0]
        r2 = generate_table(spark, t, seed=5).agg(F.sum("c119")).first()[0]
        assert r1 == r2

    def test_v0_wide_multicolumn(self, spark):
        from dbldatagen_spark import DataGenerator

        df = (
            DataGenerator(spark, name="widev0", rows=200, partitions=2)
            .withColumn("f", "float", minValue=0.0, maxValue=1.0,
                        numColumns=60)
            .build()
        )
        assert len(df.columns) == 60
        assert df.count() == 200


class TestBoundaryRanges:
    def test_int64_overflow_rejected_at_plan_time(self, spark):
        from dbldatagen_spark import ColumnSpec, RangeColumn, TableSpec

        with pytest.raises(Exception):
            TableSpec(
                "bad",
                10,
                columns=[
                    ColumnSpec("x", RangeColumn(0, 2**63), dtype="long")
                ],
            )

    def test_near_bound_long_range(self, spark):
        from dbldatagen_spark import ColumnSpec, RangeColumn, TableSpec, generate_table

        hi = 2**62
        t = TableSpec(
            "nb",
            1000,
            columns=[ColumnSpec("x", RangeColumn(hi - 10**6, hi), dtype="long")],
            partitions=4,
        )
        df = generate_table(spark, t, seed=3)
        mn, mx = df.agg(F.min("x"), F.max("x")).first()
        assert hi - 10**6 <= mn <= mx <= hi

    def test_sequence_overflow_rejected(self, spark):
        from dbldatagen_spark import ColumnSpec, SequenceColumn, TableSpec

        with pytest.raises(Exception):
            TableSpec(
                "seq_bad",
                10**6,
                columns=[
                    ColumnSpec(
                        "s",
                        SequenceColumn(start=2**63 - 100, step=1),
                        dtype="long",
                    )
                ],
            )


class TestPipelineOpsDegenerateInputs:
    """Empty frames and null/empty text through the round-4 operators —
    none may throw; each has a documented degenerate result."""

    def _empty_docs(self, spark):
        return spark.createDataFrame([], "doc_id long, text string, source string")

    def test_empty_frames(self, spark):
        from dbldatagen_spark.functions import (
            charlm_score,
            duplicated_span_stats,
            gopher_quality_flags,
            mix_corpus,
            pack_sequences,
        )

        empty = self._empty_docs(spark)
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        assert duplicated_span_stats(empty, "doc_id", "text").count() == 0
        assert gopher_quality_flags(empty, "doc_id", "text").count() == 0
        assert mix_corpus(empty, "doc_id", "source", {"a": 1.0}).count() == 0
        empty_counts = spark.createDataFrame([], "doc_id long, n long")
        assert pack_sequences(empty_counts, "doc_id", "n", 100).count() == 0
        # empty corpus to SCORE with a real fit corpus
        assert charlm_score(empty, "doc_id", "text", fit_df=docs).count() == 0

    def test_null_and_empty_text(self, spark):
        from pyspark.sql import functions as F
        from dbldatagen_spark.functions import (
            charlm_score,
            gopher_quality_flags,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        probe = spark.createDataFrame(
            [(1, None), (2, ""), (3, "   ")], "doc_id long, text string"
        )
        lm = {r["doc_id"]: r for r in
              charlm_score(probe, "doc_id", "text", fit_df=docs).collect()}
        assert all(lm[i]["bits_per_char"] is None for i in (1, 2))
        g = {r["doc_id"]: r for r in
             gopher_quality_flags(probe, "doc_id", "text").collect()}
        # null text -> null measurements, never a crash or a spurious pass
        assert g[1]["pass_all"] is None or g[1]["pass_all"] is False
        assert g[2]["pass_all"] is False or g[2]["pass_all"] is None

    def test_semantic_dedup_single_row_cluster(self, spark):
        from dbldatagen_spark.functions import semantic_dedup

        one = spark.createDataFrame(
            [(7, [1.0, 0.0], 3)], "vec_id long, embedding array<double>, label int"
        )
        rows = semantic_dedup(one, "vec_id", "embedding",
                              cluster_col="label").collect()
        assert len(rows) == 1 and rows[0]["keep"]


class TestRound5OpsDegenerateInputs:
    """Empty frames, single rows, and null values through the round-5
    operators — none may throw; each has a documented degenerate result."""

    def test_empty_frames(self, spark):
        from dbldatagen_spark.functions import (
            apply_cdc,
            budget_select,
            cohort_retention,
            contrastive_negatives,
            funnel_steps,
            merge_aggregates,
            mergeable_aggregate,
            quantile_bucket,
            quota_sample,
            scd2_intervals,
            sequence_gaps,
            weighted_sample,
            winsorize,
            zscore_normalize,
        )

        empty = spark.createDataFrame(
            [], "id long, g string, v double, ts timestamp, op string"
        )
        assert quota_sample(empty, "g", "id", 5).count() == 0
        assert budget_select(empty, "g", "id", "v", 10.0).count() == 0
        assert weighted_sample(empty, "g", "id", "v", 5).count() == 0
        assert apply_cdc(empty, ["g"], "id").count() == 0
        assert scd2_intervals(empty, "g", "ts", ["v"]).count() == 0
        assert funnel_steps(empty, "g", "ts", "op", ["a", "b"]).select(
            "n_users"
        ).collect() == [  # report rows exist, all zero
            spark.createDataFrame([(0,)], "n_users long").first(),
        ] * 2
        assert cohort_retention(empty, "g", "ts").count() == 0
        assert sequence_gaps(empty, "id").count() == 0
        assert contrastive_negatives(empty, "id").count() == 0
        # winsorize/zscore/quantile_bucket on empty: no rows out, no throw
        assert winsorize(empty, "v").count() == 0
        assert zscore_normalize(empty, "v").count() == 0
        assert quantile_bucket(empty, "v", 4).count() == 0
        s = mergeable_aggregate(empty, ["g"], "v")
        assert merge_aggregates(s, s, ["g"]).count() == 0

    def test_single_row_and_nulls(self, spark):
        from pyspark.sql import functions as F

        from dbldatagen_spark.functions import (
            psi_report,
            quantile_bucket,
            scd2_intervals,
            winsorize,
            zscore_normalize,
        )

        one = spark.createDataFrame([(1, 5.0)], ["id", "v"])
        w = winsorize(one, "v").first()
        assert w.v_winsorized == 5.0
        z = zscore_normalize(one, "v").first()
        assert z.v_z == 0.0  # stddev 0 -> degenerate maps to 0
        b = quantile_bucket(one, "v", 4).first()
        assert 1 <= b.v_bucket <= 4
        out = psi_report(one, one, "v", num_buckets=2).collect()
        assert len(out) == 2 and all(abs(r.psi_term) < 1e-9 for r in out)

        # null values: ignored by percentile paths, null-safe in SCD2
        withnull = spark.createDataFrame(
            [(1, None), (2, 5.0), (3, 7.0)], "id long, v double"
        )
        assert winsorize(withnull, "v").count() == 3
        ch = spark.createDataFrame(
            [(1, "2024-01-01 00:00:00", None), (1, "2024-01-02 00:00:00", "x")],
            ["k", "ts", "attr"],
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        ivals = scd2_intervals(ch, "k", "ts", ["attr"], order_col="ts").collect()
        assert len(ivals) == 2  # NULL -> 'x' is a change


class TestDriverCanonShape:
    """The driver's correctness gate sorts result rows via pandas over
    every output column before hashing; nested cells (list/dict/Row)
    are unhashable there and kill the gate BEFORE value comparison —
    the round-6 red rows. ``check_oracle.canon_shape_problems`` is the
    guard that keeps such schemas out of the registry."""

    def _guard(self):
        import importlib.util
        import os

        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "check_oracle.py",
        )
        spec = importlib.util.spec_from_file_location("check_oracle", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.canon_shape_problems

    def test_array_output_rejected(self, spark):
        guard = self._guard()
        df = spark.createDataFrame([(1, [0.1, 0.2])], "id long, vec array<double>")
        probs = guard(df.dtypes)
        assert len(probs) == 1 and "vec" in probs[0]

    def test_map_and_struct_rejected(self):
        guard = self._guard()
        probs = guard(
            [("m", "map<string,bigint>"), ("s", "struct<a:bigint>"), ("ok", "bigint")]
        )
        assert len(probs) == 2

    def test_scalar_schema_accepted(self, spark):
        guard = self._guard()
        df = spark.createDataFrame(
            [(1, "a|b", 0.5, True)], "id long, s string, d double, b boolean"
        )
        assert guard(df.dtypes) == []

    def test_fixed_conformance_queries_project_scalars(self, spark):
        # the two round-6 red rows must never regress to nested outputs
        import __spark_entry__ as entrymod

        qs = entrymod.queries()
        for name in ("emb_mrl_truncation", "events_behavior_vectors"):
            sdf = qs[name](spark, "/root/testdata/sf0.001")
            assert self._guard()(sdf.dtypes) == [], name


class TestMoneyHilo:
    """The r15 integer-cents money path must reproduce the decimal
    pipeline bit-for-bit: per-row scale-4 units split-summed into two
    int64s, reassembled and rounded via _money_hilo.  Adversarial
    values: exact .xx5 ties (HALF_UP away from zero), negatives (q9
    profit), and rows whose hi/lo parts carry opposite signs."""

    def test_hilo_matches_decimal_round(self, spark):
        import random

        import __spark_entry__ as entrymod

        rng = random.Random(42)
        units = (
            [150, -150, 50, -50, 49, -49, 999_950, -999_950, 0,
             1_000_000, -1_000_000, 123_456_789, -123_456_789,
             1_099_999_950, -1_099_999_950]
            + [rng.randint(-1_100_000_000, 1_100_000_000) for _ in range(200)]
        )
        # spread across groups so sums mix signs and cross the 1e6 split
        rows = [(i % 7, u) for i, u in enumerate(units)]
        df = spark.createDataFrame(rows, "g int, u long")
        got = (
            df.groupBy("g")
            .agg(*entrymod._s4_sum_aggs(F.col("u"), "_x"))
            .select("g", entrymod._money_hilo("_x").alias("money"))
        )
        ref = (
            df.groupBy("g")
            .agg(F.sum((F.col("u") / 10000).cast("decimal(38,4)")).alias("_s"))
            .select("g", F.round("_s", 2).cast("double").alias("money"))
        )
        g = {r.g: r.money for r in got.collect()}
        r = {r.g: r.money for r in ref.collect()}
        assert g.keys() == r.keys()
        for k in g:
            assert repr(g[k]) == repr(r[k]), (k, g[k], r[k])

    def test_per_row_split_identity(self, spark):
        # hi*1e6 + lo == units row-wise for both signs (truncating div
        # via exact double division, % with dividend sign)
        import __spark_entry__ as entrymod

        vals = [0, 1, -1, 999_999, -999_999, 1_000_000, -1_000_000,
                1_000_001, -1_000_001, 1_099_999_999, -1_099_999_999]
        df = spark.createDataFrame([(v,) for v in vals], "u long")
        out = df.groupBy("u").agg(
            *entrymod._s4_sum_aggs(F.col("u"), "_x")
        ).collect()
        for row in out:
            assert row["_x_hi"] * 1_000_000 + row["_x_lo"] == row["u"], row
