"""Multidimensional file-layout clustering (Z-order).

Range-partitioned writes prune files on ONE key; queries that filter two
or three columns (user AND time, part AND supplier) need the layout
trick lakehouses call Z-ordering: interleave the bits of the normalized
key columns into one scalar, then range-partition and sort by it. Rows
close in the multidimensional key space land in the same files, so
min/max file statistics prune on EVERY participating column at once.

Everything here is closed-form integer arithmetic on the JVM (shifts,
masks, adds — whole-stage codegen, no UDF), and the write path reuses
``repartitionByRange`` + ``sortWithinPartitions`` exactly like the
engine's range-partitioned sink.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]


def zorder_value_expr(
    cols: Sequence[ColumnOrName],
    *,
    bits: int = 16,
) -> Column:
    """Interleaved-bit (Morton) code of ``cols`` as one long.

    Each input must already be a non-negative integer in
    ``[0, 2**bits)`` — normalize upstream (bucketize timestamps, mod
    ids, quantile-bucket doubles); values are masked to ``bits`` bits
    regardless, so out-of-range inputs wrap rather than corrupt
    neighboring dimensions. Bit ``i`` of column ``c`` lands at output
    position ``i * len(cols) + c``, the standard Morton layout.

    ``bits * len(cols)`` must fit a signed long (<= 63). The expression
    is a flat sum of shift/mask terms — pure whole-stage-codegen
    arithmetic, engine-portable for any SQL dialect with ``&``, ``>>``
    and ``*``.
    """
    if not cols:
        raise ValueError("cols must name at least one column")
    if bits < 1 or bits * len(cols) > 63:
        raise ValueError(
            f"bits * len(cols) must be in [1, 63], got {bits * len(cols)}"
        )
    n = len(cols)
    z = F.lit(0).cast("long")
    for c_idx, c in enumerate(cols):
        col = (F.col(c) if isinstance(c, str) else c).cast("long")
        for i in range(bits):
            bit = F.shiftright(col, i).bitwiseAND(F.lit(1))
            z = z + bit * F.lit(1 << (i * n + c_idx)).cast("long")
    return z


def zorder_sort(
    df: DataFrame,
    cols: Sequence[ColumnOrName],
    *,
    bits: int = 16,
    num_partitions: Optional[int] = None,
    out_col: str = "_zvalue",
) -> DataFrame:
    """Cluster ``df`` for multidimensional file pruning: compute the
    Z-value of ``cols``, range-partition on it (``num_partitions``
    defaults to the session shuffle parallelism) and sort each
    partition by it. Writing the result produces files whose min/max
    statistics are tight on EVERY participating column.

    One range-exchange (sampled boundaries, skew-resistant) + local
    sort; the Z-value column stays in the output (drop it after the
    write if unwanted — keeping it documents the layout).
    """
    z = df.withColumn(out_col, zorder_value_expr(cols, bits=bits))
    parts = (
        z.repartitionByRange(num_partitions, out_col)
        if num_partitions
        else z.repartitionByRange(out_col)
    )
    return parts.sortWithinPartitions(out_col)


def file_rows_report(
    df: DataFrame,
    *,
    target_rows_per_file: Optional[int] = None,
) -> DataFrame:
    """Rows-per-file layout audit over a file-backed DataFrame — the
    small-files detector.  At 100 TB the small-files problem kills
    scans twice (NameNode/listing pressure, then per-file open cost
    and un-fillable vectorized batches), and its inverse — a few
    giant files — kills parallelism; this reports the shape before it
    hurts: one row of ``(n_files, total_rows, min_rows, max_rows,
    avg_rows)`` plus, given ``target_rows_per_file``, the
    ``recommended_files`` repartition target ``ceil(total /
    target)``.

    Scale shape: ``input_file_name()`` is metadata already attached
    to every scanned row, so the audit is one count-only hash
    aggregate — (file, long) pairs shuffle, never data.  Works on any
    file-based source (parquet/orc/json/csv).
    """
    per_file = df.groupBy(F.input_file_name().alias("_f")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    agg = per_file.agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("_n").cast("long").alias("total_rows"),
        F.min("_n").cast("long").alias("min_rows"),
        F.max("_n").cast("long").alias("max_rows"),
        F.floor(F.avg("_n")).cast("long").alias("avg_rows"),
    )
    if target_rows_per_file is not None:
        if target_rows_per_file < 1:
            raise ValueError(
                f"target_rows_per_file must be >= 1, got "
                f"{target_rows_per_file}"
            )
        agg = agg.withColumn(
            "recommended_files",
            F.ceil(F.col("total_rows") / F.lit(target_rows_per_file))
            .cast("long"),
        )
    return agg
