"""Watermarked streaming dedup + event-time windowed aggregation.

Batch/stream polymorphic, per the engine's operator policy: the same call
works on a batch DataFrame (exact semantics, no state bound) and on a
stream (state bounded by the watermark, which is what makes the operator
viable at 100 TB/day ingest — unbounded-key dedup state would OOM any
cluster).

The reference's only dedup is the per-micro-batch ``UniqueCombinations``
constraint (reference ``dbldatagen/constraints/unique_combinations.py:26-33``,
``supportsStreaming=False``); these operators supply the cross-batch,
watermark-bounded semantics a real pipeline needs.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_within_watermark(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop duplicate rows by ``keys``.

    * batch: plain ``dropDuplicates(keys)`` — exact, one shuffle on keys.
    * stream: ``dropDuplicatesWithinWatermark(keys)`` — keeps the first
      arrival per key, suppresses duplicates arriving within the
      watermark delay, and evicts key state once the watermark passes;
      state size is O(keys per watermark window), not O(all keys ever).
    """
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            list(keys)
        )
    return df.dropDuplicates(list(keys))


def windowed_event_counts(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: Optional[str] = None,
    watermark: str = "2 hours",
    group_col: Optional[str] = "event_type",
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` is given) event-time window
    counts with late-data handling.

    On a stream the watermark bounds window state and admits late rows up
    to the delay; on a batch frame the identical expression computes all
    windows immediately. Aggregation is partial (map-side combine) before
    the single shuffle on (window, group) — the plan a 1000-executor
    cluster wants.
    """
    src = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    group = [win] + ([F.col(group_col)] if group_col else [])
    out = src.groupBy(*group).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("value_sum"),
    )
    cols = [
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
    ]
    if group_col:
        cols.append(F.col(group_col))
    return out.select(*cols, "n_events", "value_sum")


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    *,
    left_ts: str,
    right_ts: str,
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream (or batch) interval join: pair each left row with
    right rows for the same key whose timestamp falls in
    ``[left_ts, left_ts + max_delay]`` — the attribution-join shape
    (click -> purchase within the window).

    On streams, both sides get the same watermark and the time-range
    predicate itself is what lets Spark bound join state: each side's
    buffered rows are evicted once the watermark passes their
    participation window, so state is O(rows per watermark horizon), not
    O(stream history). On batch frames the identical expression is an
    ordinary equi-join on the key with the range as residual predicate.

    ``left`` and ``right`` must not share column names other than
    ``key_col`` (alias before calling); the joined frame keeps the
    left key column. ``how``: ``inner`` (default) or the streaming-
    supported outer variants (``leftOuter``/``rightOuter``/``fullOuter``
    — outer rows emit only after the watermark closes their window).
    """
    lts, rts = F.col(left_ts), F.col(right_ts)
    if left.isStreaming or right.isStreaming:
        left = left.withWatermark(left_ts, watermark)
        right = right.withWatermark(right_ts, watermark)
    cond = (
        (left[key_col] == right[key_col])
        & (rts >= lts)
        & (rts <= lts + F.expr(f"INTERVAL {max_delay}"))
    )
    joined = left.join(right, cond, how)
    # rebuild the projection explicitly: with both inputs derived from
    # the same source, drop(right[key_col]) can resolve to the LEFT key
    # (nulling it on outer rows); coalesce covers the outer directions
    if how in ("rightOuter", "right_outer"):
        out_key = right[key_col]
    elif how in ("fullOuter", "full_outer", "full", "outer"):
        out_key = F.coalesce(left[key_col], right[key_col])
    else:
        out_key = left[key_col]
    return joined.select(
        out_key.alias(key_col),
        *[left[c] for c in left.columns if c != key_col],
        *[right[c] for c in right.columns if c != key_col],
    )
