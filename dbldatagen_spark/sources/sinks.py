"""Output sinks: batch and streaming writes from one config object.

Reference surface: ``OutputDataset`` config (``/root/reference/dbldatagen/
config.py:12-38``) + ``write_data_to_output`` (``utils.py:371-405``) +
streaming auto-detection in ``saveAsDataset``
(``data_generator.py:1957-1976``). Implementation original.

Format note: the reference defaults to ``delta`` (Databricks); this engine
defaults to ``parquet`` so it runs on stock Spark — pass
``format="delta"`` where Delta Lake is on the classpath.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional

from pyspark.sql import DataFrame


@dataclass
class OutputDataset:
    """Where/how to write generated data.

    ``trigger`` applies to streaming only; like the reference, only
    processing-time triggers (``{"processingTime": "10 seconds"}``) or
    ``{"once": True}`` / ``{"availableNow": True}`` are supported.
    """

    location: Optional[str] = None
    table: Optional[str] = None
    output_format: str = "parquet"
    mode: str = "append"
    options: Dict[str, Any] = field(default_factory=dict)
    trigger: Optional[Dict[str, Any]] = None
    checkpoint_location: Optional[str] = None
    partition_by: Optional[list] = None
    # (num_buckets, [cols...]): hash-bucketed table layout. Two tables
    # bucketed the same way join/aggregate on those keys with ZERO
    # shuffle — the write pays the shuffle once, every downstream join
    # reuses it. Requires ``table`` (Spark bucketing metadata lives in
    # the catalog, not in bare files).
    bucket_by: Optional[tuple] = None
    sort_by: Optional[list] = None
    # [cols...]: repartitionByRange on these keys before writing, so each
    # data file covers a contiguous key range (file-level min/max stats
    # then prune point/range scans). The complementary layout lever to
    # bucket_by: bucketing wins shuffle-free equi-joins, range layout wins
    # time/key-range pruning. Sampled range boundaries keep files
    # size-balanced even under key skew.
    range_partition_by: Optional[list] = None
    # with range_partition_by: also sort rows *within* each file by the
    # same keys (min/max stats tighten to row-group granularity)
    sort_within_files: bool = False
    # explicit file count for range_partition_by (None = let AQE size
    # the shuffle; explicit counts are exempt from AQE coalescing)
    range_partitions: Optional[int] = None

    def __post_init__(self) -> None:
        if not self.location and not self.table:
            raise ValueError("OutputDataset requires a location or a table name")
        if self.bucket_by is not None:
            n, cols = self.bucket_by
            if not self.table:
                raise ValueError("bucket_by requires a table (catalog) sink")
            if int(n) < 1 or not cols:
                raise ValueError("bucket_by must be (num_buckets >= 1, [cols...])")
        if self.sort_by and not self.bucket_by:
            raise ValueError("sort_by requires bucket_by")
        if self.range_partition_by is not None and self.bucket_by is not None:
            raise ValueError("range_partition_by and bucket_by are exclusive")
        if self.sort_within_files and not self.range_partition_by:
            raise ValueError("sort_within_files requires range_partition_by")
        if self.range_partitions is not None and not self.range_partition_by:
            raise ValueError("range_partitions requires range_partition_by")
        if self.trigger is not None:
            allowed = {"processingTime", "once", "availableNow"}
            bad = set(self.trigger) - allowed
            if bad:
                raise ValueError(
                    f"unsupported trigger keys {sorted(bad)} (allowed: {sorted(allowed)})"
                )


def write_data_to_output(df: DataFrame, output: OutputDataset):
    """Write a batch or streaming DataFrame per the config.

    Returns ``None`` for batch writes, the ``StreamingQuery`` for streams.
    """
    if df.isStreaming:
        writer = df.writeStream.format(output.output_format).outputMode(
            output.mode if output.mode != "overwrite" else "complete"
        )
        if output.checkpoint_location:
            writer = writer.option("checkpointLocation", output.checkpoint_location)
        for k, v in output.options.items():
            writer = writer.option(k, v)
        if output.trigger:
            writer = writer.trigger(**output.trigger)
        if output.table:
            return writer.toTable(output.table)
        return writer.start(output.location)
    if output.range_partition_by:
        if output.range_partitions:
            df = df.repartitionByRange(
                int(output.range_partitions), *output.range_partition_by
            )
        else:
            df = df.repartitionByRange(*output.range_partition_by)
        if output.sort_within_files:
            df = df.sortWithinPartitions(*output.range_partition_by)
    writer = df.write.format(output.output_format).mode(output.mode)
    if output.partition_by:
        writer = writer.partitionBy(*output.partition_by)
    if output.bucket_by:
        n, cols = output.bucket_by
        writer = writer.bucketBy(int(n), *cols)
        if output.sort_by:
            writer = writer.sortBy(*output.sort_by)
    for k, v in output.options.items():
        writer = writer.option(k, v)
    if output.table:
        writer.saveAsTable(output.table)
    else:
        writer.save(output.location)
    return None


def foreach_batch_idempotent_sink(
    df: DataFrame,
    path: str,
    checkpoint_location: str,
    *,
    fmt: str = "parquet",
    trigger: dict | None = None,
):
    """Exactly-once file sink via ``foreachBatch`` + epoch-keyed commits.

    Structured Streaming guarantees at-least-once delivery to
    ``foreachBatch``: after a crash between "wrote the data" and
    "committed the offset", the SAME batch (same ``batch_id``) is
    redelivered. This sink makes the write idempotent by keying each
    commit on the batch id:

    - each batch writes to ``{path}/batch_id={id}`` with
      ``mode("overwrite")`` — a redelivered batch overwrites its own
      partition byte-for-byte instead of appending duplicates;
    - readers see ``batch_id`` as an ordinary partition column and can
      prune on it.

    Returns the started ``StreamingQuery``. This is the pattern for
    sinks without transactional support (plain parquet/csv directories);
    transactional stores would instead use the batch id as an
    idempotence token in their own commit protocol.
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.format(fmt)
            .mode("overwrite")
            .save(f"{path}/batch_id={batch_id}")
        )

    writer = (
        df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_location)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def foreach_batch_histogram_sink(
    df: DataFrame,
    value_col: str,
    path: str,
    checkpoint_location: str,
    *,
    lo: float,
    hi: float,
    bins: int,
    group_cols=None,
    trigger: dict | None = None,
):
    """Incremental distribution maintenance over a stream: per
    micro-batch, build the batch's histogram sketch
    (:func:`dbldatagen_spark.functions.sketches.histogram_sketch` —
    bounded ``groups x bins`` rows) and commit it epoch-keyed exactly
    like :func:`foreach_batch_idempotent_sink` (a redelivered batch
    overwrites its own ``batch_id`` partition, so retries cannot
    double-count).  The persisted state is SKETCHES, never data — a
    day of micro-batches costs ``batches x bins`` rows on disk.

    Read the running distribution back with
    :func:`read_merged_histogram`; merge-on-read is exact because bin
    counts are commutative sums (``histogram_merge`` law, asserted in
    pytest against the whole-input batch sketch on a real checkpointed
    run).  Returns the started ``StreamingQuery``.
    """
    from dbldatagen_spark.functions.sketches import histogram_sketch

    groups = list(group_cols or [])

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        sk = histogram_sketch(
            batch_df, value_col, lo=lo, hi=hi, bins=bins, group_cols=groups
        )
        sk.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    writer = (
        df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_location)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def read_merged_histogram(spark, path: str, *, group_cols=None) -> DataFrame:
    """Merge-on-read for :func:`foreach_batch_histogram_sink` state:
    union all epoch partitions and re-sum the bins (the
    ``histogram_merge`` law).  One bounded aggregation over
    ``batches x bins`` sketch rows."""
    from pyspark.sql import functions as F

    groups = list(group_cols or [])
    df = spark.read.parquet(path)
    return df.groupBy(*groups, "bin").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def foreach_batch_kmv_sink(
    df: DataFrame,
    value_col: str,
    path: str,
    checkpoint_location: str,
    *,
    k: int = 64,
    seed: int = 0,
    group_cols=None,
    trigger: dict | None = None,
):
    """Streaming distinct-count maintenance: per micro-batch, build the
    batch's KMV sketch (:func:`dbldatagen_spark.functions.sketches
    .kmv_sketch` — at most ``groups x k`` 8-byte hashes) and commit it
    epoch-keyed like :func:`foreach_batch_histogram_sink` (a
    redelivered batch overwrites its own ``batch_id`` partition, so
    retries cannot corrupt the union).  The persisted state is
    SKETCHES, never values — a day of micro-batches costs
    ``batches x groups x k`` longs on disk.

    Read the running estimate back with :func:`read_merged_kmv`;
    merge-on-read is EXACT because the k smallest distinct hashes of a
    union are a subset of the union of each part's k smallest
    (``kmv_merge_expr`` law, asserted batch-side in pytest and again
    here against the whole-input sketch on a real checkpointed run).
    Returns the started ``StreamingQuery``.
    """
    from dbldatagen_spark.functions.sketches import kmv_sketch

    groups = list(group_cols or [])

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        sk = kmv_sketch(
            batch_df, value_col, group_cols=groups, k=k, seed=seed
        )
        sk.select(*groups, "sketch").write.mode("overwrite").parquet(
            f"{path}/batch_id={batch_id}"
        )

    writer = (
        df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_location)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def read_merged_kmv(spark, path: str, *, k: int, group_cols=None) -> DataFrame:
    """Merge-on-read for :func:`foreach_batch_kmv_sink` state: union
    the per-epoch sketches and fold them with ``kmv_merge_expr``
    (distinct-union, sort, first k — associative and commutative), then
    re-estimate.  Returns ``group_cols + (sketch, n_kept,
    dv_estimate)`` — the same shape ``kmv_sketch`` emits, so batch and
    streaming consumers share downstream code.  One bounded
    aggregation over ``batches x groups`` sketch rows; the
    ``collect_list`` holds at most ``batches`` arrays of ``k`` longs
    per group."""
    from pyspark.sql import functions as F

    from dbldatagen_spark.functions.sketches import (
        kmv_estimate_expr,
        kmv_merge_expr,
    )

    groups = list(group_cols or [])
    df = spark.read.parquet(path)
    merged = df.groupBy(*groups).agg(
        kmv_merge_expr(F.collect_list("sketch"), k).alias("sketch")
    )
    return merged.select(
        *groups,
        "sketch",
        F.size("sketch").cast("long").alias("n_kept"),
        kmv_estimate_expr(F.col("sketch"), k).alias("dv_estimate"),
    )


def foreach_batch_cms_sink(
    df: DataFrame,
    value_col: str,
    path: str,
    checkpoint_location: str,
    *,
    width: int = 256,
    depth: int = 4,
    seed: int = 0,
    group_cols=None,
    weight_col=None,
    trigger: dict | None = None,
):
    """Streaming frequency maintenance: per micro-batch, build the
    batch's count-min sketch (:func:`dbldatagen_spark.functions
    .sketches.cms_sketch` — at most ``groups x depth x width`` cells)
    and commit it epoch-keyed (idempotent under redelivery, as above).

    Read the running sketch back with :func:`read_merged_cms`;
    merge-on-read is EXACT because CMS cells are commutative sums
    (``cms_merge`` law) — the merged sketch equals the whole-input
    batch sketch cell-for-cell, so every downstream estimate
    (``cms_estimate`` / ``cms_heavy_hitters`` / ``cms_join_size``)
    is identical too.  Returns the started ``StreamingQuery``.
    """
    from dbldatagen_spark.functions.sketches import cms_sketch

    groups = list(group_cols or [])

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        sk = cms_sketch(
            batch_df,
            value_col,
            width=width,
            depth=depth,
            seed=seed,
            group_cols=groups,
            weight_col=weight_col,
        )
        sk.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    writer = (
        df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_location)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def read_merged_cms(spark, path: str, *, group_cols=None) -> DataFrame:
    """Merge-on-read for :func:`foreach_batch_cms_sink` state: union
    the per-epoch cells and re-sum (the ``cms_merge`` law).  Returns
    the standard sparse sketch shape ``group_cols + (depth_idx,
    bucket, cnt)``.  One bounded aggregation over
    ``batches x groups x depth x width`` cells."""
    from pyspark.sql import functions as F

    groups = list(group_cols or [])
    df = spark.read.parquet(path)
    return df.groupBy(*groups, "depth_idx", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def foreach_batch_hll_sink(
    df: DataFrame,
    value_col: str,
    path: str,
    checkpoint_location: str,
    *,
    p: int = 8,
    seed: int = 0,
    group_cols=None,
    trigger: dict | None = None,
):
    """Streaming distinct-count maintenance with HyperLogLog — the
    fixed-size sibling of :func:`foreach_batch_kmv_sink`: per micro
    batch, build the batch's dense register vector
    (:func:`dbldatagen_spark.functions.sketches.hll_sketch` — exactly
    ``groups x 2^p`` small ints regardless of batch size) and commit
    it epoch-keyed (a redelivered batch overwrites its own
    ``batch_id`` partition, so retries cannot corrupt the union —
    element-wise max is also idempotent, a belt-and-braces property
    KMV's union shares).

    Read the running estimate back with :func:`read_merged_hll`;
    merge-on-read is EXACT at register granularity because
    ``max(max(a), max(b)) = max(a ∪ b)`` per register
    (``hll_merge_expr`` law, asserted against the whole-input sketch
    on a real checkpointed run in pytest and in the registry query).
    Returns the started ``StreamingQuery``.
    """
    from dbldatagen_spark.functions.sketches import hll_sketch

    groups = list(group_cols or [])

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        sk = hll_sketch(
            batch_df, value_col, group_cols=groups, p=p, seed=seed
        )
        sk.select(*groups, "registers").write.mode("overwrite").parquet(
            f"{path}/batch_id={batch_id}"
        )

    writer = (
        df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_location)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def read_merged_hll(spark, path: str, *, p: int = 8, group_cols=None) -> DataFrame:
    """Merge-on-read for :func:`foreach_batch_hll_sink` state: union
    the per-epoch register vectors and fold them with
    ``hll_merge_expr`` (element-wise max — associative, commutative,
    idempotent), then re-estimate.  Returns ``group_cols +
    (registers, n_zero_registers, dv_estimate)`` — the same shape
    ``hll_sketch`` emits, so batch and streaming consumers share
    downstream code.  One bounded aggregation over ``batches x
    groups`` vectors of ``2^p`` ints each."""
    from pyspark.sql import functions as F

    from dbldatagen_spark.functions.sketches import (
        hll_estimate_expr,
        hll_merge_expr,
    )

    groups = list(group_cols or [])
    df = spark.read.parquet(path)
    merged = df.groupBy(*groups).agg(
        hll_merge_expr(F.collect_list("registers"), p=p).alias("registers")
    )
    return merged.select(
        *groups,
        "registers",
        F.size(F.filter(F.col("registers"), lambda r: r == 0))
        .cast("int")
        .alias("n_zero_registers"),
        hll_estimate_expr(F.col("registers"), p=p).alias("dv_estimate"),
    )
