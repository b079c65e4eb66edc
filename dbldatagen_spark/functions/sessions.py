"""Gap-based sessionization over event tables, with a skew-safe route.

The classic formulation — one window partitioned by the raw user key —
is correct and minimal (one shuffle, reused by the follow-up groupBy),
but a single mega-user (bot traffic) serializes that user's entire
history onto one task at 100x scale. ``method="skew_safe"`` is the
two-phase remedy:

1. **Local phase** — the per-event window partitions by
   ``(user, coarse time bucket)``, so a hot user's events spread across
   ``#buckets`` tasks. Gap breaks are detected *within* each bucket and
   the events collapse to per-segment summaries (count / min / max /
   value sum).
2. **Merge phase** — a second window, still per user but now over the
   *segment* table (orders of magnitude smaller than the event table:
   one row per contiguous run of events per bucket), stitches segments
   whose boundary gap is within the threshold. Within-bucket segments
   are separated by real gaps by construction, so the stitch only ever
   joins across bucket edges — the result is exactly the single-phase
   output.

The same decomposition idea backs :func:`~dbldatagen_spark.functions
.skew.salted_join` (spread a hot key, then recombine cheaply); for
continuous pipelines, ``streaming/stateful.py``'s session windows
(``applyInPandasWithState``) are the incremental route.

No counterpart in the reference repo (its scope ends at generation);
this extends the pipeline surface like ``functions/dedup.py``.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# per-user event count above which the single-window plan's one-task
# serialization of that user's history is treated as a straggler
# hazard and method="auto" routes to the skew_safe decomposition.
# Larger than the fold family's caps because a window sorts rows
# without materializing a per-key array — the bound is task time, not
# the 2 GB array ceiling.
DEFAULT_MAX_EVENTS_WINDOW = 1_000_000


def choose_sessionize_method(
    df: DataFrame,
    user_col: str,
    *,
    max_events_per_key: int = DEFAULT_MAX_EVENTS_WINDOW,
) -> str:
    """The ``method="auto"`` routing decision, exposed so callers can
    log/emit which plan ran: ``"skew_safe"`` if ANY user's event count
    exceeds ``max_events_per_key`` (that user's history would
    serialize onto one task under ``method="window"``), else
    ``"window"`` (one fewer window pass).  This closes the loop
    :func:`session_key_report` opens — the audit names the users, this
    routes around them.

    Cost: one EAGER count-only job at call time (``(user, long)``
    pairs shuffle with map-side combine, then an existence probe) —
    the same trade as the fold family's loud guard; cache ``df`` if
    its upstream is expensive, or pick the method explicitly to stay
    fully lazy.
    """
    if max_events_per_key < 1:
        raise ValueError(
            f"max_events_per_key must be >= 1, got {max_events_per_key}"
        )
    over = (
        df.groupBy(user_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > max_events_per_key)
        .limit(1)
    )
    return "skew_safe" if not over.isEmpty() else "window"


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    gap_seconds: float = 1800.0,
    value_col: Optional[str] = None,
    method: str = "window",
    bucket_seconds: int = 86400,
    max_events_per_key: int = DEFAULT_MAX_EVENTS_WINDOW,
) -> DataFrame:
    """Collapse events into inactivity-gap sessions per user.

    Returns one row per session: ``(user, session_seq, n_events,
    session_start, session_end[, session_value])`` where ``session_seq``
    is the user's 1-based session ordinal and ``session_value`` (present
    when ``value_col`` is given) is the per-session sum.

    ``method="window"`` is the classic single-pass formulation;
    ``method="skew_safe"`` computes identical results via the two-phase
    bucket/merge decomposition (see module docstring) and should be
    preferred when some users can dominate the event volume. Pick
    ``bucket_seconds`` well above ``gap_seconds`` (default: one day vs a
    30-minute gap) so sessions rarely straddle many buckets.

    ``method="auto"`` runs :func:`choose_sessionize_method` first (one
    eager count-only job, ``max_events_per_key`` threshold) and picks
    the plan per call: bounded users get the cheaper single-window
    route, a detected mega-user routes everyone through the skew-safe
    decomposition.  Both routes produce identical session rows
    (pytest-asserted), so auto never changes results — only the plan.
    """
    if method == "auto":
        method = choose_sessionize_method(
            df, user_col, max_events_per_key=max_events_per_key
        )
    if method == "window":
        return _sessionize_window(df, user_col, ts_col, gap_seconds, value_col)
    if method == "skew_safe":
        if bucket_seconds <= gap_seconds:
            raise ValueError(
                f"bucket_seconds ({bucket_seconds}) must exceed gap_seconds "
                f"({gap_seconds}) for the merge phase to be boundary-only"
            )
        return _sessionize_skew_safe(
            df, user_col, ts_col, gap_seconds, value_col, bucket_seconds
        )
    raise ValueError(f"unknown sessionize method {method!r}")


def _ts_double(df: DataFrame, ts_col: str):
    """Seconds-as-double view of the timestamp column, keeping sub-second
    precision (``unix_timestamp`` truncates). TIMESTAMP_NTZ has no direct
    double cast — route it through TIMESTAMP (identity under a pinned
    session timezone, and both methods share the same conversion either
    way so their equality never depends on it)."""
    col = F.col(ts_col)
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        col = col.cast("timestamp")
    return col.cast("double")


def _agg_cols(value_col: Optional[str], ts: str = "ts_d"):
    cols = [
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("_ts_orig").alias("session_start"),
        F.max("_ts_orig").alias("session_end"),
    ]
    if value_col is not None:
        cols.append(F.sum(value_col).alias("session_value"))
    return cols


def _sessionize_window(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: float,
    value_col: Optional[str],
) -> DataFrame:
    w = Window.partitionBy(user_col).orderBy("_ts_d")
    ev = df.withColumn("_ts_d", _ts_double(df, ts_col)).withColumn(
        "_ts_orig", F.col(ts_col)
    )
    gap = F.col("_ts_d") - F.lag("_ts_d").over(w)
    with_sid = ev.withColumn(
        "_brk", F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    ).withColumn("session_seq", F.sum("_brk").over(w).cast("long"))
    return with_sid.groupBy(user_col, "session_seq").agg(*_agg_cols(value_col))


def _sessionize_skew_safe(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: float,
    value_col: Optional[str],
    bucket_seconds: int,
) -> DataFrame:
    ev = df.withColumn("_ts_d", _ts_double(df, ts_col)).withColumn(
        "_ts_orig", F.col(ts_col)
    )
    ev = ev.withColumn(
        "_bucket", F.floor(F.col("_ts_d") / F.lit(float(bucket_seconds)))
    )
    # phase 1: gap breaks within (user, bucket) — the hot-user key is split
    wl = Window.partitionBy(user_col, "_bucket").orderBy("_ts_d")
    gap = F.col("_ts_d") - F.lag("_ts_d").over(wl)
    segs = (
        ev.withColumn(
            "_brk", F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
        )
        .withColumn("_seg", F.sum("_brk").over(wl))
        .groupBy(user_col, "_bucket", "_seg")
        .agg(
            *_agg_cols(value_col),
            F.min("_ts_d").alias("_start_d"),
            F.max("_ts_d").alias("_end_d"),
        )
    )
    # phase 2: stitch boundary-adjacent segments per user; the input here
    # is one row per contiguous event run, not per event
    wm = Window.partitionBy(user_col).orderBy("_start_d")
    boundary_gap = F.col("_start_d") - F.lag("_end_d").over(wm)
    merged = segs.withColumn(
        "_brk", F.when(boundary_gap.isNull() | (boundary_gap > gap_seconds), 1)
        .otherwise(0)
    ).withColumn("session_seq", F.sum("_brk").over(wm).cast("long"))
    final_aggs = [
        F.sum("n_events").cast("long").alias("n_events"),
        F.min("session_start").alias("session_start"),
        F.max("session_end").alias("session_end"),
    ]
    if value_col is not None:
        final_aggs.append(F.sum("session_value").alias("session_value"))
    return merged.groupBy(user_col, "session_seq").agg(*final_aggs)


def session_features(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    gap_seconds: float = 1800.0,
    event_type_col: str,
    order_col: str,
    value_col: Optional[str] = None,
) -> DataFrame:
    """Per-session ML feature table: the feature-store composite built
    on inactivity-gap sessions. One row per session with

    ``(user, session_seq, n_events, duration_seconds, entry_type,
    exit_type, is_bounce[, session_value])``

    where ``entry_type``/``exit_type`` are the first/last event types
    (ties at equal timestamps broken by ``order_col``) and
    ``is_bounce`` marks single-event sessions — the standard
    engagement-feature row for churn/conversion models.

    Scale shape: the session assignment is one lag + running-sum window
    on the user key; the feature rollup is one aggregation on
    (user, session) that REUSES the same partitioning (entry/exit ride
    ``min_by``/``max_by`` — no second sort). Integer-exact epochs keep
    durations engine-portable.
    """
    from pyspark.sql import Window

    epoch = F.floor(
        F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    ).cast("long")
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    gap = epoch - F.lag(epoch).over(w)
    assigned = df.withColumn(
        "_new",
        F.when(gap.isNull() | (gap > F.lit(float(gap_seconds))), 1).otherwise(
            0
        ),
    ).withColumn("_sid", F.sum("_new").over(w))

    ordkey = F.struct(epoch.alias("e"), F.col(order_col).alias("o"))
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.max(epoch) - F.min(epoch)).cast("long").alias("duration_seconds"),
        F.expr(f"min_by({event_type_col}, struct(_ek, _ok))").alias(
            "entry_type"
        ),
        F.expr(f"max_by({event_type_col}, struct(_ek, _ok))").alias(
            "exit_type"
        ),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("session_value"))
    out = (
        assigned.withColumn("_ek", epoch)
        .withColumn("_ok", F.col(order_col))
        .groupBy(F.col(user_col), F.col("_sid").cast("long").alias("session_seq"))
        .agg(*aggs)
        .withColumn("is_bounce", F.col("n_events") == 1)
    )
    return out


def session_key_report(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    max_events_per_key: int,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Skew audit for :func:`sessionize` — the ``fold_key_report``
    counterpart for the session family ("no silent stragglers"): one
    row per user whose total event count exceeds ``max_events_per_key``
    — exactly the users whose history would serialize onto ONE task
    under ``method="window"`` — with the shape the ``skew_safe``
    decomposition would split them into:

    ``(user, n_events, n_buckets, max_bucket_events,
    action='route_skew_safe')``

    ``max_bucket_events`` is the largest single (user, time-bucket)
    slice, i.e. the worst task the two-phase route still runs — if it
    is close to ``n_events`` the user's traffic is concentrated inside
    one bucket and ``bucket_seconds`` should shrink.  Empty result =
    every user is bounded and ``method="window"`` is already the right
    plan (one fewer window).

    Scale shape: count-only aggregations — one shuffle of
    ``(user, bucket, long)`` cells, one of ``(user, long)`` rollups;
    no payloads, no event lists.
    """
    if max_events_per_key < 1:
        raise ValueError(
            f"max_events_per_key must be >= 1, got {max_events_per_key}"
        )
    if bucket_seconds < 1:
        raise ValueError(f"bucket_seconds must be >= 1, got {bucket_seconds}")
    ev = df.select(
        F.col(user_col).alias("user"),
        F.floor(_ts_double(df, ts_col) / F.lit(float(bucket_seconds)))
        .cast("long")
        .alias("_bucket"),
    )
    per_bucket = ev.groupBy("user", "_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    return (
        per_bucket.groupBy("user")
        .agg(
            F.sum("_n").cast("long").alias("n_events"),
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.max("_n").cast("long").alias("max_bucket_events"),
        )
        .where(F.col("n_events") > max_events_per_key)
        .select(
            "user",
            "n_events",
            "n_buckets",
            "max_bucket_events",
            F.lit("route_skew_safe").alias("action"),
        )
        .orderBy(F.col("n_events").desc(), "user")
    )
