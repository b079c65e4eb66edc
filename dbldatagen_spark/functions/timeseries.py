"""Time-series regularization operators.

Event streams are irregular; model features and monitoring both want a
regular lattice per key. The classic preparation is bucket -> gap-fill ->
forward-fill, and the scale question is always the same: the lattice
explode is bounded by ``keys x span/interval`` (not by event count), the
observation aggregation is one map-side-combined shuffle, and the
forward fill is one per-key ordered window — no UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_gap_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    interval_seconds: int,
    order_col: str,
) -> DataFrame:
    """Regularize an event stream onto a fixed per-key time lattice with
    forward fill.

    Buckets timestamps to ``interval_seconds``, keeps the LAST
    observation per (key, bucket) — "last" by ``order_col``, a unique
    column (event id), so the choice is deterministic under any
    partitioning — then emits one row for EVERY bucket between each
    key's first and last observation, carrying the most recent value
    forward across empty buckets.

    Returns ``(key, bucket_ts, value, was_observed)`` where
    ``was_observed`` is false on filled (interpolated) rows.

    Scale shape: one aggregation keyed on (key, bucket) with map-side
    combine; the lattice is a per-key ``sequence`` explode bounded by
    ``span / interval`` rows per key, never by event count; the forward
    fill reuses the key partitioning in one ordered window. All epoch
    arithmetic is integer-exact, so results are engine-portable.
    """
    if interval_seconds <= 0:
        raise ValueError(f"interval_seconds must be positive, got {interval_seconds}")
    step = F.lit(int(interval_seconds)).cast("long")
    epoch = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    bucket = (F.floor(epoch / step) * step).cast("long")

    obs = (
        df.select(
            F.col(key_col), bucket.alias("_bucket"),
            F.col(value_col).alias("_v"), F.col(order_col).alias("_ord"),
        )
        .groupBy(key_col, "_bucket")
        .agg(F.expr("max_by(_v, _ord)").alias("_v"))
    )
    spans = obs.groupBy(key_col).agg(
        F.min("_bucket").alias("_lo"), F.max("_bucket").alias("_hi")
    )
    lattice = spans.select(
        F.col(key_col),
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"), step)).alias("_bucket"),
    )
    joined = lattice.join(obs, [key_col, "_bucket"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        F.col(key_col),
        F.to_timestamp(F.col("_bucket")).cast("timestamp_ntz").alias("bucket_ts"),
        F.last("_v", ignorenulls=True).over(w).alias(value_col),
        F.col("_v").isNotNull().alias("was_observed"),
    )
