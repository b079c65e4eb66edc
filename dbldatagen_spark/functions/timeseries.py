"""Time-series regularization operators.

Event streams are irregular; model features and monitoring both want a
regular lattice per key. The classic preparation is bucket -> gap-fill ->
forward-fill, and the scale question is always the same: the lattice
explode is bounded by ``keys x span/interval`` (not by event count), the
observation aggregation is one map-side-combined shuffle, and the
forward fill is one per-key ordered window — no UDF anywhere.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Default per-key event caps for the batch fold family.  The folds
# collect one key's full (filtered) event history into a single array
# and fold it in one task, so a viral key is a straggler, the
# append-folds (ewma/cusum) do quadratic element-copy work, and at the
# extreme the 2 GB array ceiling applies.  APPEND_FOLD covers the
# folds that rebuild their output array each step (quadratic copies —
# ~100k events is already ~5e9 element moves in one task); SCAN_FOLD
# covers the O(n)-per-key folds whose bound is memory/straggler only.
DEFAULT_MAX_EVENTS_APPEND_FOLD = 100_000
DEFAULT_MAX_EVENTS_SCAN_FOLD = 1_000_000


class FoldKeyGuard:
    """ONE shared eager pre-pass for N guarded folds over the same
    frame.  Every fold in the family (:func:`ewma`,
    :func:`cusum_flags`, :func:`holt_linear`,
    :func:`trajectory_vectors`, :func:`autocorrelation`,
    ``analytics.funnel_steps``, ``ratelimit.rate_limit_events``)
    accepts an instance wherever it takes ``max_events_per_key``; the
    key-count job runs exactly once — here, at construction — and the
    folds themselves add NO further jobs or plan nodes on the healthy
    path::

        guard = FoldKeyGuard(events, "user_id",
                             max_events_per_key=100_000,
                             where="value IS NOT NULL")
        a = ewma(events, "user_id", "ts", "value", order_col="event_id",
                 max_events_per_key=guard)
        b = cusum_flags(events, "user_id", "ts", "value",
                        order_col="event_id", max_events_per_key=guard)

    Modes mirror the per-fold guard: ``on_oversized="error"``
    (default) raises AT CONSTRUCTION naming the hottest keys;
    ``"divert"`` collects the oversized-key set once (bounded by
    ``max_diverted_keys`` — viral keys are a handful by assumption,
    and the collect is ``limit``-capped so driver traffic is provably
    bounded) and each fold drops them via one broadcast anti-join.

    ``where`` should be the same event filter the guarded folds apply
    (``"value IS NOT NULL"`` for the numeric folds, ``"step IN
    (...)"`` for funnels — the :func:`fold_key_report` convention).
    Omitting it is safe but conservative: the guard counts MORE rows
    than the fold folds, so it can only over-trigger, never let a hot
    key through.
    """

    def __init__(
        self,
        df: DataFrame,
        key_col: str,
        *,
        max_events_per_key: int = DEFAULT_MAX_EVENTS_APPEND_FOLD,
        on_oversized: str = "error",
        where: Optional[str] = None,
        max_diverted_keys: int = 100_000,
    ) -> None:
        if max_events_per_key is None or int(max_events_per_key) < 1:
            raise ValueError(
                f"max_events_per_key must be >= 1, got {max_events_per_key}"
            )
        if on_oversized not in ("error", "divert"):
            raise ValueError(
                f"on_oversized must be 'error' or 'divert', got {on_oversized!r}"
            )
        self.key_col = key_col
        self.max_events_per_key = int(max_events_per_key)
        self.on_oversized = on_oversized
        self.where = where
        base = df.where(F.expr(where)) if where else df
        over = (
            base.groupBy(key_col)
            .agg(F.count(F.lit(1)).alias("_n_ev"))
            .where(F.col("_n_ev") > self.max_events_per_key)
        )
        self._key_type = over.schema[key_col].dataType
        if on_oversized == "error":
            hot = over.orderBy(F.col("_n_ev").desc(), key_col).limit(5).collect()
            if hot:
                names = ", ".join(f"{r[0]}={r[1]} events" for r in hot)
                raise ValueError(
                    f"keys exceed max_events_per_key="
                    f"{self.max_events_per_key} (top: {names}). Raise the "
                    f"cap, construct the guard with on_oversized='divert' "
                    f"to drop these keys from every guarded fold, or "
                    f"replay them through the O(1)-state streaming twins "
                    f"(streaming.stateful)."
                )
            self._over_keys: list = []
        else:
            rows = over.select(key_col).limit(max_diverted_keys + 1).collect()
            if len(rows) > max_diverted_keys:
                raise ValueError(
                    f"more than max_diverted_keys={max_diverted_keys} keys "
                    f"exceed the cap — the oversized set is no longer 'a "
                    f"handful of viral keys' and broadcast diversion is the "
                    f"wrong tool; raise the cap or restructure the pipeline."
                )
            self._over_keys = [r[0] for r in rows]

    def apply(self, ev: DataFrame, key: str) -> DataFrame:
        """Drop this guard's oversized keys from ``ev`` (whose key
        column is named ``key``).  No-op in ``"error"`` mode (the
        construction already proved every key fits) and when the
        diverted set is empty — the healthy path keeps its single key
        shuffle."""
        if not self._over_keys:
            return ev
        from pyspark.sql import types as _T

        spark = ev.sparkSession
        over_df = spark.createDataFrame(
            [(k,) for k in self._over_keys],
            _T.StructType([_T.StructField(key, self._key_type)]),
        )
        return ev.join(F.broadcast(over_df), key, "left_anti")


def _divert_oversized_keys(
    ev: DataFrame, key: str, cap, on_oversized: str = "error"
) -> DataFrame:
    """Enforce a ``max_events_per_key`` cap on a pre-fold
    ``(key, event)`` frame.  The folds collect one key's full history
    into a single array in one task, so an unbounded viral key is a
    straggler / 2 GB-array hazard — but a cap must never SILENTLY
    change results (the fold family's oracle contract is "folds every
    key it returns, bit-for-bit").  Two explicit modes:

    - ``on_oversized="error"`` (default): the cap is enforced IN-PLAN
      by :func:`_check_fold_size` at the fold's own aggregation (a
      ``CASE WHEN size(evts) > cap THEN raise_error(...)`` over the
      collected array) — zero extra jobs, zero extra scans, fully
      lazy; the frame passes through here UNTOUCHED and the
      healthy-path plan keeps its single key shuffle.  An oversized
      key fails the ACTION loudly, naming the key and its count.
      Result rows are therefore always exactly the all-keys fold —
      equal to any external replay by construction.  (This replaced
      the round-14 eager count-job pre-pass: the pre-pass re-scanned
      the whole input per call — measured 0.42 s of ewma's 1.43 s at
      the sf1 bench lane — and its only advantage was failing BEFORE
      the offending key's array materializes; the in-plan check still
      bounds that array by the task's memory, and a key so hot that
      collecting it OOMs a task also fails loudly, just less
      politely.  Callers needing the pre-collection failure mode at
      the cost of one eager job can construct a :class:`FoldKeyGuard`,
      which keeps the eager contract.)
    - ``on_oversized="divert"``: lazily remove oversized keys BEFORE
      any ``collect_list`` materializes their history (count pre-pass,
      only ``(key, long)`` pairs shuffle; the oversized-key set is a
      handful of viral keys, so AQE broadcasts the anti-join).  This
      mode DROPS those keys from the output — opt-in, and
      :func:`fold_key_report` with the same filter names every
      diverted key.  Point diverted keys at the O(1)-state streaming
      twins (``streaming.stateful.ewma_with_state`` /
      ``cusum_with_state``) replayed over the key's ordered history.

    ``cap=None`` disables the guard entirely (explicit opt-out for
    known-bounded keys).  ``cap`` may
    also be a :class:`FoldKeyGuard`: the shared pre-pass already ran at
    guard construction, so this adds no job — passthrough in
    ``"error"`` mode, one broadcast anti-join in ``"divert"`` mode.
    """
    if cap is None:
        return ev
    if isinstance(cap, FoldKeyGuard):
        return cap.apply(ev, key)
    if cap < 1:
        raise ValueError(f"max_events_per_key must be >= 1, got {cap}")
    if on_oversized not in ("error", "divert"):
        raise ValueError(
            f"on_oversized must be 'error' or 'divert', got {on_oversized!r}"
        )
    if on_oversized == "divert":
        over = (
            ev.groupBy(key)
            .agg(F.count(F.lit(1)).alias("_n_ev"))
            .where(F.col("_n_ev") > cap)
        )
        return ev.join(over.select(key), key, "left_anti")
    # "error" mode: enforcement happens in-plan at the fold's own
    # aggregation (_check_fold_size) — no eager job here
    return ev


def _check_fold_size(
    df: DataFrame, evts_col: str, key_col: str, cap, on_oversized: str,
    op: str,
) -> DataFrame:
    """In-plan ``on_oversized="error"`` enforcement for the fold family:
    wrap the collected per-key event array so an array longer than
    ``cap`` raises AT ACTION TIME, naming the key and its size.  Rides
    the fold's own aggregation — no extra job, no extra scan (the
    round-14 eager count pre-pass cost a full input scan per call).
    No-op for ``cap=None`` (opt-out), a :class:`FoldKeyGuard` (its
    eager pre-pass already enforced the cap), and ``"divert"`` mode
    (oversized keys were anti-joined away before collection)."""
    if cap is None or isinstance(cap, FoldKeyGuard) or on_oversized != "error":
        return df
    msg = F.concat_ws(
        "",
        F.lit(f"{op}: key "),
        F.col(key_col).cast("string"),
        F.lit(" has "),
        F.size(F.col(evts_col)).cast("string"),
        F.lit(
            f" events, exceeding max_events_per_key={int(cap)}. A hot key "
            f"folds its whole history in one task (append-folds do "
            f"quadratic element copies). Either raise the cap, pass "
            f"max_events_per_key=None to fold everything anyway, pass "
            f"on_oversized='divert' to drop oversized keys (audit with "
            f"fold_key_report), or replay them through the O(1)-state "
            f"streaming twins (streaming.stateful)."
        ),
    )
    return df.withColumn(
        evts_col,
        F.when(F.size(F.col(evts_col)) <= F.lit(int(cap)), F.col(evts_col))
        .otherwise(F.raise_error(msg)),
    )


def fold_key_report(
    df: DataFrame,
    key_col: str,
    *,
    max_events_per_key: int,
    where: Optional[str] = None,
) -> DataFrame:
    """Companion audit for the fold family's ``max_events_per_key``
    guard — "no silent caps": one row per key the cap diverted,
    ``(key, n_events, action='diverted')``, descending by size.  Pass
    the same event filter the guarded fold applies via ``where`` (a
    SQL boolean expression): ``"value IS NOT NULL"`` for
    :func:`ewma` / :func:`cusum_flags` / :func:`trajectory_vectors` /
    :func:`autocorrelation`, ``"step IN (...)"`` for
    ``analytics.funnel_steps``.  Empty result = the guard never fired
    and the fold covered every key.

    Scale shape: count-only aggregation — ``(key, long)`` pairs
    shuffle, nothing else.
    """
    if max_events_per_key < 1:
        raise ValueError(
            f"max_events_per_key must be >= 1, got {max_events_per_key}"
        )
    base = df.where(F.expr(where)) if where else df
    return (
        base.groupBy(F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .where(F.col("n_events") > max_events_per_key)
        .select("key", "n_events", F.lit("diverted").alias("action"))
        .orderBy(F.col("n_events").desc(), "key")
    )


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


def seasonal_residual_flags(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    *,
    group_col: str | None = None,
    season: str = "hour_of_week",
    k: float = 3.0,
) -> DataFrame:
    """Seasonal-baseline anomaly flags: compare each observation to the
    mean of its seasonal slot (same hour-of-week / hour-of-day /
    day-of-week, optionally per ``group_col``) and flag rows more than
    ``k`` population standard deviations away — the classic first-line
    monitor for metrics with daily/weekly shape, where a global
    threshold would fire on every rush hour.

    Adds ``season_slot``, ``season_mean``, ``season_std``,
    ``residual`` (value - slot mean) and ``is_anomaly``. Slots with zero
    variance (constant or single-observation) never flag — a repeat of
    the constant is not anomalous, and a first observation has no
    baseline.

    Masking caveat: a point inside its own n-observation baseline can
    never exceed z = sqrt(n-1), so ``k=3`` needs slots with well over
    10 observations — pick the coarsest ``season`` your data's shape
    allows (hour_of_day pools 7x more than hour_of_week), or fit the
    baseline on a reference window and score a disjoint one.

    Plan shape: one map-side-combined aggregation on the (group, slot)
    key — a few thousand rows at most — broadcast-joined back over the
    scan. The value column never shuffles; two passes over the input
    (baseline + score), both scan-local.
    """
    ts = F.col(ts_col).cast("timestamp")
    if season == "hour_of_week":
        slot = (F.dayofweek(ts) - 1) * 24 + F.hour(ts)
    elif season == "hour_of_day":
        slot = F.hour(ts)
    elif season == "day_of_week":
        slot = F.dayofweek(ts) - 1
    else:
        raise ValueError(
            "season must be hour_of_week|hour_of_day|day_of_week, "
            f"got {season!r}"
        )
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")

    v = F.col(value_col).cast("double")
    keyed = df.withColumn("season_slot", slot.cast("int"))
    group_keys = (["season_slot", group_col] if group_col else ["season_slot"])
    baseline = keyed.groupBy(*group_keys).agg(
        F.avg(v).alias("season_mean"),
        F.stddev_pop(v).alias("season_std"),
    )
    # null-safe join-back: a plain equi-join would silently drop rows
    # whose group value is NULL even though their baseline row exists
    renamed = baseline
    for gk in group_keys:
        renamed = renamed.withColumnRenamed(gk, f"_bl_{gk}")
    cond = F.lit(True)
    for gk in group_keys:
        cond = cond & keyed[gk].eqNullSafe(F.col(f"_bl_{gk}"))
    scored = keyed.join(F.broadcast(renamed), cond).drop(
        *[f"_bl_{gk}" for gk in group_keys]
    )
    resid = v - F.col("season_mean")
    return scored.withColumn("residual", resid).withColumn(
        "is_anomaly",
        (F.col("season_std") > 0)
        & (F.abs(resid) > F.lit(float(k)) * F.col("season_std")),
    )


def ohlc_bars(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    interval_seconds: int = 3600,
    order_col: str,
) -> DataFrame:
    """Downsample a per-key value stream into OHLC bars (open / high /
    low / close + observation count) on a fixed time lattice — the
    standard tick-to-bar compaction for prices, sensor readings, and
    metric rollups.

    ``open``/``close`` are the FIRST/LAST observations of each bar by
    ``(ts, order_col)`` — ``order_col`` (a unique id) makes the pick
    deterministic when timestamps collide. Returns
    ``(key, bar_ts, open, high, low, close, n_obs)``.

    Scale shape: ONE map-side-combined aggregation on (key, bucket) —
    open/close ride ``min_by``/``max_by`` over a packed (epoch, order)
    sort key, so there is no window, no sort, no second shuffle; the
    epoch math is integer-exact and engine-portable.
    """
    if interval_seconds <= 0:
        raise ValueError(
            f"interval_seconds must be positive, got {interval_seconds}"
        )
    step = F.lit(int(interval_seconds)).cast("long")
    epoch = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    bucket = (F.floor(epoch / step) * step).cast("long")

    keyed = df.select(
        F.col(key_col),
        bucket.alias("_bucket"),
        F.col(value_col).cast("double").alias("_v"),
        F.struct(
            epoch.alias("e"), F.col(order_col).alias("o")
        ).alias("_ord"),
    )
    return (
        keyed.groupBy(key_col, "_bucket")
        .agg(
            F.expr("min_by(_v, _ord)").alias("open"),
            F.max("_v").alias("high"),
            F.min("_v").alias("low"),
            F.expr("max_by(_v, _ord)").alias("close"),
            F.count(F.lit(1)).cast("long").alias("n_obs"),
        )
        .select(
            key_col,
            F.to_timestamp(F.col("_bucket"))
            .cast("timestamp_ntz")
            .alias("bar_ts"),
            "open",
            "high",
            "low",
            "close",
            "n_obs",
        )
    )


def ewma(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    alpha: float,
    order_col: str,
    out_col: str = "ewma",
    max_events_per_key: Optional[int] = DEFAULT_MAX_EVENTS_APPEND_FOLD,
    on_oversized: str = "error",
) -> DataFrame:
    """Exponentially weighted moving average per key over time order:
    ``s_0 = v_0``, ``s_i = alpha*v_i + (1-alpha)*s_{i-1}`` — a genuinely
    recursive smoother (each output depends on the previous output), so
    no window frame can express it. Folded through ``F.aggregate`` over
    the key's time-sorted ``(ts, order, value)`` structs — JVM
    higher-order function, no UDF, ONE shuffle on the key — then
    exploded back to one output row per input row:
    ``(key, ts, order, value, out_col)``.

    Ties on ``ts`` break by ``order_col`` (total order => deterministic
    floats: both this fold and an external replay add in the identical
    sequence, so results are bit-reproducible). NULL values are
    excluded before smoothing.

    Scale shape: per-key state is the key's own event list — the same
    bound as any per-entity sequence model (cf. ``funnel_steps``,
    ``rate_limit_events``); keys fan out across the cluster, and
    nothing but ``(ts, order, value)`` triples ever shuffles.  Honest
    limit: the fold appends to its output array each step, which is
    quadratic ELEMENT-COPY work within one key — negligible to ~10k
    events/key, but a single very hot key (millions of events) would
    be one straggler task and ultimately the 2 GB array ceiling — so
    ``max_events_per_key`` (default ``DEFAULT_MAX_EVENTS_APPEND_FOLD``)
    guards it.  By default (``on_oversized="error"``) an oversized key
    FAILS the call loudly, naming the offenders — results therefore
    always fold every key, equal to any external replay by
    construction, never silently missing rows.  Opt into
    ``on_oversized="divert"`` to drop oversized keys pre-collect
    instead (count pre-pass, only ``(key, long)`` shuffles) and audit
    them via :func:`fold_key_report` with
    ``where=f"{value_col} IS NOT NULL"``.  Run the streaming twin
    (``streaming.stateful.ewma_with_state`` — O(1) state, O(n) work)
    over a hot key's ordered history instead.  ``None`` opts out.
    Guard cost: the ``"error"`` default is enforced IN-PLAN at this
    fold's own aggregation (``_check_fold_size`` — a CASE/raise_error
    over the collected array), so it adds no job, no scan, and stays
    fully lazy; the oversized-key failure fires at the action.
    ``"divert"`` adds one lazy count pre-pass + anti-join.
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    a = F.lit(float(alpha))
    ev = _divert_oversized_keys(
        df.where(F.col(value_col).isNotNull()).select(
            F.col(key_col).alias("_k"),
            F.struct(
                F.col(ts_col).alias("t"),
                F.col(order_col).alias("o"),
                F.col(value_col).cast("double").alias("v"),
            ).alias("_e"),
        ),
        "_k",
        max_events_per_key,
        on_oversized,
    ).groupBy("_k").agg(F.array_sort(F.collect_list("_e")).alias("_evts"))
    ev = _check_fold_size(
        ev, "_evts", "_k", max_events_per_key, on_oversized, "ewma"
    )
    init = F.struct(
        F.array().cast("array<double>").alias("arr"),
        F.lit(None).cast("double").alias("last"),
    )

    def _step(acc, e):
        nxt = F.when(acc["last"].isNull(), e["v"]).otherwise(
            a * e["v"] + (F.lit(1.0) - a) * acc["last"]
        )
        return F.struct(
            F.concat(acc["arr"], F.array(nxt)).alias("arr"), nxt.alias("last")
        )

    smoothed = ev.withColumn(
        "_sm", F.aggregate(F.col("_evts"), init, _step, lambda acc: acc["arr"])
    )
    z = smoothed.select(
        "_k", F.explode_outer(F.arrays_zip("_evts", "_sm")).alias("_z")
    ).where(F.col("_z").isNotNull())
    return z.select(
        F.col("_k").alias(key_col),
        F.col("_z._evts.t").alias(ts_col),
        F.col("_z._evts.o").alias(order_col),
        F.col("_z._evts.v").alias(value_col),
        F.col("_z._sm").alias(out_col),
    )


def cusum_flags(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    drift: float,
    threshold: float,
    order_col: str,
    target: Optional[float] = None,
    reset_on_alarm: bool = True,
    max_events_per_key: Optional[int] = DEFAULT_MAX_EVENTS_APPEND_FOLD,
    on_oversized: str = "error",
) -> DataFrame:
    """Two-sided CUSUM change-point detection per key over time order:
    ``s+_i = max(0, s+_{i-1} + (v_i - target - drift))`` (and the
    mirrored ``s-`` for downward shifts), alarm when either statistic
    exceeds ``threshold``. Like :func:`ewma` this is a genuinely
    recursive statistic no window frame can express — folded through
    ``F.aggregate`` over each key's time-sorted events (JVM
    higher-order function, no UDF, ONE shuffle on the key) and exploded
    back to one row per event: ``(key, ts, order, value, cusum_pos,
    cusum_neg, alarm)``.

    ``target`` is the in-control level the statistic accumulates
    deviations from; ``None`` (default) self-calibrates to the key's
    own mean, computed as a sorted fold (``F.aggregate`` over
    ``array_sort``) so an external replay summing in the same sorted
    order reproduces the double bit-for-bit. ``reset_on_alarm=True``
    restarts both statistics at zero after an alarm fires (standard
    practice: detect each shift once, not forever). NULL values are
    excluded; ties on ``ts`` break by ``order_col`` (total order =>
    bit-reproducible floats).

    Scale shape: identical to :func:`ewma` — per-key state is the
    key's own event list, keys fan out across the cluster, and only
    ``(ts, order, value)`` triples shuffle; the same hot-key
    quadratic-copy bound applies and the same
    ``max_events_per_key`` guard closes it (default
    ``on_oversized="error"`` fails loudly naming the hot keys;
    ``"divert"`` drops them pre-collect, audited via
    :func:`fold_key_report`; remedy for hot keys:
    ``streaming.stateful.cusum_with_state``, O(1) state — note the
    streaming twin needs an explicit ``target``, self-calibration is a
    two-pass batch luxury).  The ``"error"`` default is enforced
    in-plan at the fold's own aggregation — no extra job, fully lazy
    (see :func:`ewma`).
    """
    if drift < 0.0:
        raise ValueError(f"drift must be >= 0, got {drift}")
    if threshold <= 0.0:
        raise ValueError(f"threshold must be > 0, got {threshold}")
    d = F.lit(float(drift))
    h = F.lit(float(threshold))
    ev = _divert_oversized_keys(
        df.where(F.col(value_col).isNotNull()).select(
            F.col(key_col).alias("_k"),
            F.struct(
                F.col(ts_col).alias("t"),
                F.col(order_col).alias("o"),
                F.col(value_col).cast("double").alias("v"),
            ).alias("_e"),
        ),
        "_k",
        max_events_per_key,
        on_oversized,
    ).groupBy("_k").agg(F.array_sort(F.collect_list("_e")).alias("_evts"))
    ev = _check_fold_size(
        ev, "_evts", "_k", max_events_per_key, on_oversized, "cusum_flags"
    )
    if target is None:
        vals = F.array_sort(F.transform(F.col("_evts"), lambda e: e["v"]))
        mu = F.aggregate(
            vals, F.lit(0.0), lambda acc, v: acc + v
        ) / F.size(vals).cast("double")
    else:
        mu = F.lit(float(target))
    ev = ev.withColumn("_mu", mu)

    init = F.struct(
        F.array().cast("array<double>").alias("ap"),
        F.array().cast("array<double>").alias("an"),
        F.lit(0.0).alias("sp"),
        F.lit(0.0).alias("sn"),
    )

    def _step(acc, e):
        rp = F.greatest(F.lit(0.0), acc["sp"] + (e["v"] - F.col("_mu") - d))
        rn = F.greatest(F.lit(0.0), acc["sn"] + (F.col("_mu") - e["v"] - d))
        alarm = (rp > h) | (rn > h)
        carry = F.lit(reset_on_alarm) & alarm
        return F.struct(
            F.concat(acc["ap"], F.array(rp)).alias("ap"),
            F.concat(acc["an"], F.array(rn)).alias("an"),
            F.when(carry, F.lit(0.0)).otherwise(rp).alias("sp"),
            F.when(carry, F.lit(0.0)).otherwise(rn).alias("sn"),
        )

    folded = ev.withColumn("_st", F.aggregate(F.col("_evts"), init, _step))
    z = folded.select(
        "_k",
        F.explode_outer(
            F.arrays_zip(F.col("_evts"), F.col("_st.ap"), F.col("_st.an"))
        ).alias("_z"),
    ).where(F.col("_z").isNotNull())
    rp = F.col("_z.ap")
    rn = F.col("_z.an")
    return z.select(
        F.col("_k").alias(key_col),
        F.col("_z._evts.t").alias(ts_col),
        F.col("_z._evts.o").alias(order_col),
        F.col("_z._evts.v").alias(value_col),
        rp.alias("cusum_pos"),
        rn.alias("cusum_neg"),
        ((rp > h) | (rn > h)).alias("alarm"),
    )


def trajectory_vectors(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    n_points: int = 16,
    order_col: Optional[str] = None,
    max_events_per_key: Optional[int] = DEFAULT_MAX_EVENTS_SCAN_FOLD,
    on_oversized: str = "error",
) -> DataFrame:
    """Fixed-length trajectory envelope per key — the signature that
    makes behavioral similarity search tractable at scale (cf. REPOSE,
    ICDE 2021: distributed top-k trajectory search runs on compact
    per-trajectory signatures, never raw point sets): each key's
    ``[min_ts, max_ts]`` span divides into ``n_points`` equal buckets,
    the vector holds bucket mean values (time-normalized, so keys with
    different spans and rates compare), empty buckets forward-fill and
    leading gaps take the key mean.  Returns
    ``(key, traj array<double>, n_obs)``.

    Engine-exact: bucket means fold over VALUE-sorted per-bucket lists
    and the key mean over the value-sorted full list (the repo's
    portable sorted-fold idiom), so an external SQL replay reproduces
    every double bit-for-bit.

    Scale shape: one shuffle of ``(key, (ts, value))`` pairs — the
    same per-key event-list bound as :func:`ewma`; the n_points x
    events bucket scan is map-side after the exchange, and what leaves
    is ``n_points`` doubles per key.  Downstream similarity search
    (cosine top-k, LSH, kNN join over ``traj``) is sketch-sized work.
    The scan is linear (no append-fold), so the hot-key bound is
    memory/straggler only — ``max_events_per_key`` (default
    ``DEFAULT_MAX_EVENTS_SCAN_FOLD``) guards it: the default
    ``on_oversized="error"`` fails loudly naming viral keys,
    ``"divert"`` drops them pre-collect (audit with
    :func:`fold_key_report`).  The ``"error"`` default is
    enforced in-plan at the fold's own aggregation — no extra job,
    fully lazy (see :func:`ewma`).
    """
    if n_points < 2:
        raise ValueError(f"n_points must be >= 2, got {n_points}")
    ev = _divert_oversized_keys(
        df.where(F.col(value_col).isNotNull()).select(
            F.col(key_col).alias("_k"),
            F.struct(
                F.unix_timestamp(F.col(ts_col).cast("timestamp"))
                .cast("double")
                .alias("t"),
                F.col(value_col).cast("double").alias("v"),
            ).alias("_e"),
        ),
        "_k",
        max_events_per_key,
        on_oversized,
    ).groupBy("_k").agg(
        F.collect_list("_e").alias("_evts"),
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        # span endpoints as AGGREGATES, not array_min/array_max over the
        # collected list: agg outputs are leaf attributes, so the bucket
        # lambda below references two scalars per element.  Inlining the
        # array scans into the lambda re-evaluates an O(n) min/max per
        # ELEMENT per bucket — O(n_points * n^2) interpreted HOF work per
        # key; measured at sf0.1 (1500 keys x ~67 events) that was 103 s
        # for the envelope projection vs ~1 s this way.
        F.min(F.col("_e").getField("t")).alias("_t0"),
        F.max(F.col("_e").getField("t")).alias("_t1"),
    )
    ev = _check_fold_size(
        ev, "_evts", "_k", max_events_per_key, on_oversized,
        "trajectory_vectors",
    )
    evts = F.col("_evts")
    t0 = F.col("_t0")
    span = F.col("_t1") - F.col("_t0")

    def _sorted_mean(vals: Column) -> Column:
        s = F.array_sort(vals)
        return F.when(
            F.size(s) > 0,
            F.aggregate(s, F.lit(0.0), lambda a, v: a + v)
            / F.size(s).cast("double"),
        )

    def _bucket_of(e: Column) -> Column:
        # span==0 (single instant) puts everything in bucket 0
        raw = F.when(
            span > 0.0,
            F.floor((e["t"] - t0) / span * F.lit(float(n_points))).cast("int"),
        ).otherwise(F.lit(0))
        return F.least(F.lit(n_points - 1), F.greatest(F.lit(0), raw))

    raw_vec = F.transform(
        F.sequence(F.lit(0), F.lit(n_points - 1)),
        lambda b: _sorted_mean(
            F.transform(
                F.filter(evts, lambda e: _bucket_of(e) == b), lambda e: e["v"]
            )
        ),
    )
    key_mean = _sorted_mean(F.transform(evts, lambda e: e["v"]))
    # forward fill empty buckets; leading gaps take the key mean
    filled = F.aggregate(
        raw_vec,
        F.struct(
            F.array().cast("array<double>").alias("arr"),
            key_mean.alias("last"),
        ),
        lambda acc, v: F.struct(
            F.concat(
                acc["arr"], F.array(F.coalesce(v, acc["last"]))
            ).alias("arr"),
            F.coalesce(v, acc["last"]).alias("last"),
        ),
        lambda acc: acc["arr"],
    )
    return ev.select(
        F.col("_k").alias(key_col),
        filled.alias("traj"),
        F.col("n_obs"),
    )


def autocorrelation(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    lag: int = 1,
    order_col: str,
    out_col: str = "acf",
    max_events_per_key: Optional[int] = DEFAULT_MAX_EVENTS_SCAN_FOLD,
    on_oversized: str = "error",
) -> DataFrame:
    """Per-key lag-``k`` autocorrelation of a value series — the
    persistence/burstiness profile (near 1: trending metric; near 0:
    noise; negative: oscillation) that separates real signals from
    shuffled ones before a forecasting model ever trains:
    ``r_k = sum((x_t - mu)(x_{t+k} - mu)) / sum((x_t - mu)^2)`` over
    the key's time-ordered series.  Returns ``(key, n, out_col)`` with
    NULL where undefined (``n <= lag`` or zero variance).

    Engine-exact: every sum folds LEFT-TO-RIGHT over the explicit
    ``(ts, order)`` total order with a 0.0 seed — the same sequence an
    external list fold replays — so the doubles match bit-for-bit.
    Ties on ``ts`` break by ``order_col``.

    Scale shape: the :func:`ewma` bound — one shuffle of
    ``(ts, order, value)`` triples per key; the lagged products are an
    index walk over the key's own array, map-side (linear, no
    append-fold).  ``max_events_per_key`` (default
    ``DEFAULT_MAX_EVENTS_SCAN_FOLD``) guards it: the default
    ``on_oversized="error"`` fails loudly naming viral keys,
    ``"divert"`` drops them pre-collect (audit with
    :func:`fold_key_report`).  The ``"error"`` default is
    enforced in-plan at the fold's own aggregation — no extra job,
    fully lazy (see :func:`ewma`).
    """
    if lag < 1:
        raise ValueError(f"lag must be >= 1, got {lag}")
    ev = _divert_oversized_keys(
        df.where(F.col(value_col).isNotNull()).select(
            F.col(key_col).alias("_k"),
            F.struct(
                F.col(ts_col).cast("timestamp").alias("t"),
                F.col(order_col).alias("o"),
                F.col(value_col).cast("double").alias("v"),
            ).alias("_e"),
        ),
        "_k",
        max_events_per_key,
        on_oversized,
    ).groupBy("_k").agg(
        # project the time-ordered value array INSIDE the agg so `_vals`
        # is a leaf attribute: `element_at(vals, i)` inside the lagged
        # lambda would otherwise re-evaluate the whole transform per
        # sequence element — O(n^2) interpreted HOF work per key
        F.transform(
            F.array_sort(F.collect_list("_e")), lambda e: e["v"]
        ).alias("_vals")
    )
    ev = _check_fold_size(
        ev, "_vals", "_k", max_events_per_key, on_oversized,
        "autocorrelation",
    )
    vals = F.col("_vals")
    n = F.size(vals)

    def _fold(arr: Column) -> Column:
        return F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)

    # materialize the O(n)-fold mean once per key: `mu` is referenced
    # inside both per-element lambdas below, and inlining the fold there
    # re-evaluates it per element (the CollapseProject multi-reference
    # check keeps this projection intact)
    ev = ev.select("_k", "_vals", (_fold(vals) / n.cast("double")).alias("_mu"))
    mu = F.col("_mu")
    # ANSI element_at throws out-of-bounds and sequence(1, 0) DESCENDS,
    # so both the range and the indices clamp — never rely on the outer
    # when() to short-circuit evaluation
    lagged = F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(lag), F.lit(1))),
        lambda i: (F.element_at(vals, F.least(i, n)) - mu)
        * (F.element_at(vals, F.least(i + F.lit(lag), n)) - mu),
    )
    centered = F.transform(
        vals, lambda v: (v - mu) * (v - mu)
    )
    num = F.when(n > lag, _fold(lagged)).otherwise(F.lit(0.0))
    den = _fold(centered)
    return ev.select(
        F.col("_k").alias(key_col),
        n.cast("long").alias("n"),
        F.when((n > lag) & (den > 0.0), num / den).alias(out_col),
    )


def resample_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    interval_seconds: int,
    order_col: str,
) -> DataFrame:
    """Resample an irregular per-key series onto a fixed time lattice
    with LINEAR interpolation — the numeric sibling of
    :func:`time_gap_fill` (which carries the last value forward, a
    step function; this draws the line between the bracketing
    observations, the right call for continuous signals like sensor
    values or prices).

    Grid points span ``ceil(first_obs / step) .. floor(last_obs /
    step)`` per key, so every grid point is bracketed by observations
    and no extrapolation happens.  NULL-valued rows are dropped up
    front (matching :func:`holt_linear`): they are not observations,
    do not extend the lattice span, and can never produce NULL grid
    values.  A grid point landing exactly on an observation returns
    that observation's value (``was_exact`` true).  Duplicate
    timestamps within a key resolve deterministically to the
    observation with the highest ``order_col`` (a unique id).

    Returns ``(key, grid_ts, value, was_exact)``.

    Portability: timestamps become integer epoch seconds, so the
    bracketing and the interpolation ratio ``(t - t_prev) / (t_next -
    t_prev)`` are built from exact integers; the interpolation itself
    is ``v_prev + (v_next - v_prev) * ratio`` — one subtraction, one
    multiply, one add in that order, replayed identically by a SQL
    oracle.

    Scale shape: the observation dedupe is a (key, second) hash
    aggregate with map-side combine; the lattice explode is bounded by
    ``span / interval`` rows per key; the prev/next brackets are two
    window frames over the SAME (key ORDER BY ts) sort — Spark plans
    one exchange + one sort feeding both WindowExecs, so the whole
    operator costs one shuffle on the key.
    """
    if interval_seconds <= 0:
        raise ValueError(
            f"interval_seconds must be positive, got {interval_seconds}"
        )
    step = F.lit(int(interval_seconds)).cast("long")
    epoch = F.unix_timestamp(F.col(ts_col).cast("timestamp"))

    obs = (
        df.where(F.col(value_col).isNotNull())
        .select(
            F.col(key_col),
            epoch.alias("_t"),
            F.col(value_col).cast("double").alias("_v"),
            F.col(order_col).alias("_ord"),
        )
        .groupBy(key_col, "_t")
        .agg(F.expr("max_by(_v, _ord)").alias("_v"))
    )
    spans = obs.groupBy(key_col).agg(
        F.min("_t").alias("_lo"), F.max("_t").alias("_hi")
    )
    lattice = spans.where(
        F.ceil(F.col("_lo") / step) * step <= F.col("_hi")
    ).select(
        F.col(key_col),
        F.explode_outer(
            F.sequence(
                (F.ceil(F.col("_lo") / step) * step).cast("long"),
                F.col("_hi").cast("long"),
                step,
            )
        ).alias("_t"),
    ).where(F.col("_t").isNotNull())
    # union grid (flag 1, null value) with observations (flag 0);
    # at an exact hit the observation sorts first and becomes _pv/_pt
    unioned = obs.select(
        key_col, "_t", "_v", F.lit(0).alias("_g")
    ).unionByName(
        lattice.select(
            key_col, "_t", F.lit(None).cast("double").alias("_v"),
            F.lit(1).alias("_g"),
        )
    )
    back = (
        Window.partitionBy(key_col)
        .orderBy("_t", "_g")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    fwd = (
        Window.partitionBy(key_col)
        .orderBy("_t", "_g")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    prev_t = F.last(F.when(F.col("_v").isNotNull(), F.col("_t")), True).over(back)
    prev_v = F.last("_v", ignorenulls=True).over(back)
    next_t = F.first(F.when(F.col("_v").isNotNull(), F.col("_t")), True).over(fwd)
    next_v = F.first("_v", ignorenulls=True).over(fwd)
    # brackets are computed over the FULL union (observations included),
    # THEN the grid rows are kept — filtering first would leave the
    # windows nothing to bracket with
    bracketed = unioned.select(
        F.col(key_col),
        F.col("_t"),
        F.col("_g"),
        prev_t.alias("_pt"), prev_v.alias("_pv"),
        next_t.alias("_nt"), next_v.alias("_nv"),
    ).where(F.col("_g") == 1)
    ratio = (F.col("_t") - F.col("_pt")).cast("double") / (
        F.col("_nt") - F.col("_pt")
    ).cast("double")
    value = F.when(F.col("_t") == F.col("_pt"), F.col("_pv")).otherwise(
        F.col("_pv") + (F.col("_nv") - F.col("_pv")) * ratio
    )
    return bracketed.select(
        F.col(key_col),
        F.to_timestamp(F.col("_t")).cast("timestamp_ntz").alias("grid_ts"),
        value.alias(value_col),
        (F.col("_t") == F.col("_pt")).alias("was_exact"),
    )


def holt_linear(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    alpha: float,
    beta: float,
    order_col: str,
    max_events_per_key: Optional[int] = DEFAULT_MAX_EVENTS_APPEND_FOLD,
    on_oversized: str = "error",
) -> DataFrame:
    """Holt's linear-trend smoother (double exponential smoothing) per
    key over time order — the trend-aware sibling of :func:`ewma`:

    - ``l_0 = v_0``, ``b_0 = 0``
    - ``l_i = alpha*v_i + (1-alpha)*(l_{i-1} + b_{i-1})``
    - ``b_i = beta*(l_i - l_{i-1}) + (1-beta)*b_{i-1}``

    Level AND trend are genuinely recursive (each depends on the
    previous outputs), so no window frame can express them; both fold
    through one ``F.aggregate`` over the key's time-sorted events —
    JVM higher-order function, no UDF, ONE shuffle on the key — and
    explode back to one row per event:
    ``(key, ts, order, value, level, trend)``.  ``level + trend`` is
    the one-step-ahead forecast, the usual anomaly baseline.

    Ties on ``ts`` break by ``order_col`` (total order => deterministic
    floats); with dyadic ``alpha``/``beta`` (0.25, 0.125, ...) every
    coefficient is an exact binary fraction, so an external
    recursive-CTE replay reproduces each double bit-for-bit.  NULLs
    are excluded before smoothing.  Scale shape, hot-key guard
    (``max_events_per_key`` / ``on_oversized``), and the streaming
    twin contract (``streaming.stateful.holt_with_state``, TWO doubles
    of state per key) all mirror :func:`ewma`.
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if not (0.0 < beta <= 1.0):
        raise ValueError(f"beta must be in (0, 1], got {beta}")
    a = F.lit(float(alpha))
    bta = F.lit(float(beta))
    ev = _divert_oversized_keys(
        df.where(F.col(value_col).isNotNull()).select(
            F.col(key_col).alias("_k"),
            F.struct(
                F.col(ts_col).alias("t"),
                F.col(order_col).alias("o"),
                F.col(value_col).cast("double").alias("v"),
            ).alias("_e"),
        ),
        "_k",
        max_events_per_key,
        on_oversized,
    ).groupBy("_k").agg(F.array_sort(F.collect_list("_e")).alias("_evts"))
    ev = _check_fold_size(
        ev, "_evts", "_k", max_events_per_key, on_oversized, "holt_linear"
    )
    # accumulator carries TWO FLAT double arrays rather than one
    # array<struct<l,b>>: measured 2.2x faster end-to-end at 1M rows
    # (nested-struct array append + explode serialization dominates),
    # with bit-identical arithmetic
    init = F.struct(
        F.array().cast("array<double>").alias("ls"),
        F.array().cast("array<double>").alias("bs"),
        F.lit(None).cast("double").alias("l"),
        F.lit(None).cast("double").alias("b"),
    )

    def _step(acc, e):
        l_new = F.when(acc["l"].isNull(), e["v"]).otherwise(
            a * e["v"] + (F.lit(1.0) - a) * (acc["l"] + acc["b"])
        )
        b_new = F.when(acc["l"].isNull(), F.lit(0.0)).otherwise(
            bta * (l_new - acc["l"]) + (F.lit(1.0) - bta) * acc["b"]
        )
        return F.struct(
            F.concat(acc["ls"], F.array(l_new)).alias("ls"),
            F.concat(acc["bs"], F.array(b_new)).alias("bs"),
            l_new.alias("l"),
            b_new.alias("b"),
        )

    smoothed = ev.withColumn(
        "_sm",
        F.aggregate(
            F.col("_evts"),
            init,
            _step,
            lambda acc: F.struct(
                acc["ls"].alias("ls"), acc["bs"].alias("bs")
            ),
        ),
    )
    z = smoothed.select(
        "_k",
        F.explode_outer(
            F.arrays_zip(
                "_evts",
                F.col("_sm.ls").alias("_l"),
                F.col("_sm.bs").alias("_b"),
            )
        ).alias("_z"),
    )
    return z.select(
        F.col("_k").alias(key_col),
        F.col("_z._evts.t").alias(ts_col),
        F.col("_z._evts.o").alias(order_col),
        F.col("_z._evts.v").alias(value_col),
        F.col("_z._l").alias("level"),
        F.col("_z._b").alias("trend"),
    )

