"""Behavioral analytics operators: ordered funnels and cohort retention.

Product analytics at warehouse scale reduces to two shapes Spark has no
verb for: "did each user do A then B then C, in order" and "of the users
who first appeared in week W, how many were active k weeks later". Both
are built here as single-key-shuffle plans:

- the funnel folds each user's time-sorted events through a stage
  machine with ``F.aggregate`` (a JVM higher-order function — no UDF,
  no per-step re-scan of the input, one shuffle on the user key);
- retention is two aggregations on (user) and (cohort, offset) where
  only keys and dates shuffle.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dbldatagen_spark.functions.timeseries import (
    DEFAULT_MAX_EVENTS_SCAN_FOLD,
    _check_fold_size,
    _divert_oversized_keys,
)


def funnel_steps(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    step_col: str,
    steps: Sequence[str],
    *,
    max_events_per_key: Optional[int] = DEFAULT_MAX_EVENTS_SCAN_FOLD,
    on_oversized: str = "error",
) -> DataFrame:
    """Ordered-funnel conversion: for each user, walk ``steps`` in order
    and record the deepest stage reached, where stage k+1 requires an
    event of that step STRICTLY after the event that satisfied stage k.
    Returns one row per funnel step:

    ``(step_index, step, n_users)``

    with ``n_users`` = users who reached at least that stage. The
    greedy-earliest walk is optimal (taking the earliest admissible
    event for each stage never excludes a deeper completion), so this
    equals "exists an increasing subsequence matching the step list" —
    the definition an oracle can replay with a chain of min-after-min
    aggregations.

    Scale shape: events are filtered to funnel steps at the scan, then
    ONE shuffle on the user key; each user's (ts, step) pairs are sorted
    and folded through a stage machine via ``F.aggregate`` — JVM
    higher-order function, no UDF, no join per step. Per-user state is
    the user's own funnel events only; the final count is a bounded
    conditional aggregation.  A user with a viral event count would be
    one straggler task, so ``max_events_per_key`` (default
    ``timeseries.DEFAULT_MAX_EVENTS_SCAN_FOLD``) guards it: the
    default ``on_oversized="error"`` fails loudly naming oversized
    users (results always cover every user, or the call raises);
    ``"divert"`` drops them before their array builds — audit with
    ``timeseries.fold_key_report(df, user_col,
    where=f"{step_col} IN (...)")`` — no silent caps.  The
    ``"error"`` default is enforced in-plan at the fold's own
    aggregation — no extra job, fully lazy (see ``timeseries.ewma``).
    """
    if not steps:
        raise ValueError("steps must name at least one funnel step")
    if len(set(steps)) != len(steps):
        raise ValueError(f"steps must be distinct, got {steps!r}")
    n = len(steps)
    step_arr = F.array(*[F.lit(s) for s in steps])

    per_user = _divert_oversized_keys(
        df.where(F.col(step_col).isin(list(steps))).select(
            F.col(user_col).alias("_u"),
            F.struct(
                F.col(ts_col).cast("timestamp").alias("t"),
                F.col(step_col).alias("s"),
            ).alias("_e"),
        ),
        "_u",
        max_events_per_key,
        on_oversized,
    ).groupBy("_u").agg(F.array_sort(F.collect_list("_e")).alias("_evts"))
    per_user = _check_fold_size(
        per_user, "_evts", "_u", max_events_per_key, on_oversized,
        "funnel_steps",
    )

    init = F.struct(
        F.lit(0).alias("stage"),
        F.lit(None).cast("timestamp").alias("last"),
    )

    def _advance(acc, e):
        # index clamped to n: once the walk completes, stage+1 would be
        # out of bounds, and ANSI element_at throws on invalid indices —
        # the guard conjunct alone must not be relied on to short-circuit
        nxt = F.element_at(step_arr, F.least(acc["stage"] + 1, F.lit(n)))
        match = (
            (acc["stage"] < F.lit(n))
            & (e["s"] == nxt)
            & ((acc["stage"] == 0) | (e["t"] > acc["last"]))
        )
        return F.struct(
            F.when(match, acc["stage"] + 1).otherwise(acc["stage"]).alias("stage"),
            F.when(match, e["t"]).otherwise(acc["last"]).alias("last"),
        )

    staged = per_user.select(
        F.aggregate(F.col("_evts"), init, _advance)["stage"].alias("_stage")
    )
    reached = staged.agg(
        *[
            # coalesce: sum over an empty frame is NULL, but "0 users
            # reached" is the truthful report for an empty input
            F.coalesce(
                F.sum((F.col("_stage") >= F.lit(i + 1)).cast("long")),
                F.lit(0).cast("long"),
            ).alias(f"_r{i}")
            for i in range(n)
        ]
    )
    stack = ", ".join(f"{i + 1}, '{steps[i]}', _r{i}" for i in range(n))
    return reached.selectExpr(
        f"stack({n}, {stack}) AS (step_index, step, n_users)"
    ).orderBy("step_index")


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    period: str = "week",
    max_offset: int = 12,
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the ``period``
    (``week``/``month``/``day``) of their first activity; for each
    (cohort, offset) cell, count the distinct users active ``offset``
    periods after their cohort period (offset 0 = the cohort size).

    Returns ``(cohort_start, period_offset, n_active)`` for offsets up
    to ``max_offset``.

    Scale shape: ONE shuffle on the user key, map-side combined — the
    per-user ``collect_set`` of active periods partially aggregates in
    each map task, so a bot user with millions of raw events ships at
    most (distinct periods) rows per map task instead of buffering its
    whole event stream in one window group (an unordered min-window
    over the user key — the previous form — is a hot-key buffer AQE
    cannot split; per-user state here is bounded by the calendar, not
    the event volume).  Then one map-side-combined aggregation on
    (cohort, offset) — dates and keys shuffle, never event payloads.
    Offsets are exact integer arithmetic on truncated dates, so any
    engine reproduces the matrix.
    """
    if period not in ("day", "week", "month"):
        raise ValueError(f"period must be day|week|month, got {period!r}")
    if max_offset < 0:
        raise ValueError(f"max_offset must be >= 0, got {max_offset}")
    p = F.date_trunc(period, F.col(ts_col)).cast("date")
    active = (
        df.select(F.col(user_col).alias("_u"), p.alias("_p"))
        .groupBy("_u")
        .agg(F.collect_set("_p").alias("_ps"))
        .select(
            "_u",
            F.array_min("_ps").alias("_cohort"),
            F.explode_outer("_ps").alias("_p"),
        )
        .where(F.col("_p").isNotNull())
    )
    if period == "month":
        offset = (F.months_between(F.col("_p"), F.col("_cohort"))).cast("long")
    elif period == "week":
        offset = (F.datediff(F.col("_p"), F.col("_cohort")) / 7).cast("long")
    else:
        offset = F.datediff(F.col("_p"), F.col("_cohort")).cast("long")
    return (
        active.withColumn("_off", offset)
        .where(F.col("_off") <= F.lit(max_offset))
        .groupBy(
            F.col("_cohort").alias("cohort_start"),
            F.col("_off").alias("period_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
        .orderBy("cohort_start", "period_offset")
    )


def transition_matrix(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    *,
    order_col: Optional[str] = None,
) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences: for each key, consecutive events (ordered by ``ts_col``,
    ties by ``order_col``) contribute one ``(from_state, to_state)``
    transition; the matrix aggregates them across keys with row-
    normalized probabilities — the journey model behind "what do users
    do after X" and behavioral-simulation generators.

    Returns ``(from_state, to_state, n_transitions, prob)`` where
    ``prob`` is ``n / sum(n over from_state)`` — one integer division
    per cell, engine-exact.

    Scale shape: one shuffle on the key for the lag window, then one
    map-side-combined aggregation on the (from, to) pair — state names
    only, never payloads; the row normalization is a window over the
    (|states|^2)-row matrix, which is metadata-sized.
    """
    order = [F.col(ts_col)] + ([F.col(order_col)] if order_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    pairs = (
        df.select(
            F.lag(F.col(state_col)).over(w).alias("from_state"),
            F.col(state_col).alias("to_state"),
        )
        .where(F.col("from_state").isNotNull())
    )
    counts = pairs.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions")
    )
    wn = Window.partitionBy("from_state")
    return (
        counts.withColumn(
            "prob",
            F.col("n_transitions") / F.sum("n_transitions").over(wn),
        )
        .orderBy("from_state", "to_state")
    )


def common_paths(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    *,
    path_len: int = 3,
    top_k: int = 20,
    order_col: Optional[str] = None,
    separator: str = " > ",
) -> DataFrame:
    """Most common length-``path_len`` event paths: every window of
    ``path_len`` consecutive events inside a key's sequence counts as
    one path occurrence — the higher-order companion to
    :func:`transition_matrix` ("what are the top click-paths"), and the
    n-gram miner behind journey simulation.

    Returns ``(path, n_occurrences, rank)`` for the ``top_k`` paths,
    ties broken by path string so the report is deterministic.

    Scale shape: one shuffle on the key; the ``path_len - 1`` lags all
    share that window; path counting is one map-side-combined
    aggregation on the path string; top-k compiles to
    TakeOrderedAndProject (per-partition heads, no global sort) with
    rank assigned over the tiny surviving set.
    """
    if path_len < 2:
        raise ValueError(f"path_len must be >= 2, got {path_len}")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    order = [F.col(ts_col)] + ([F.col(order_col)] if order_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    steps = [
        F.lag(F.col(state_col), path_len - 1 - i).over(w)
        for i in range(path_len)
    ]
    paths = (
        df.select(F.concat_ws(separator, *steps).alias("path"), *[
            s.alias(f"_s{i}") for i, s in enumerate(steps)
        ])
        .where(F.col("_s0").isNotNull())  # window not yet full
        .select("path")
    )
    counts = paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )
    topk = counts.orderBy(F.col("n_occurrences").desc(), F.col("path")).limit(
        top_k
    )
    wr = Window.orderBy(F.col("n_occurrences").desc(), F.col("path"))
    return topk.withColumn("rank", F.row_number().over(wr).cast("int")).orderBy(
        "rank"
    )


def behavior_vectors(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    *,
    order_col: str,
    states: Sequence[str],
) -> DataFrame:
    """Per-key behavioral signature: the row-flattened ``k x k`` matrix
    of the KEY'S OWN transition frequencies over the explicit
    ``states`` vocabulary — ``vec[i*k + j] = n(i -> j) / total`` — the
    categorical twin of ``timeseries.trajectory_vectors``: cosine or
    kNN over ``behavior`` finds keys that *behave* alike, k-means over
    it clusters personas.  :func:`transition_matrix` aggregates the
    whole population; this keeps one distribution per key.

    ``states`` is explicit so dimensionality and index order are fixed
    (stable features across runs and datasets); transitions touching
    states outside the vocabulary are ignored and keys with no
    in-vocabulary transitions are dropped.  Frequencies are integer
    ratios — engine-exact.  Returns ``(key, behavior array<double>,
    n_transitions)``.

    Scale shape: one key shuffle for the lag window, reused by the
    per-key aggregation; only ``(key, state-pair index)`` rows move and
    the vector assembles from a bounded ``k^2`` map per key.
    """
    if len(states) < 2:
        raise ValueError(f"states needs >= 2 entries, got {len(states)}")
    if len(set(states)) != len(states):
        raise ValueError("states must be distinct")
    k = len(states)
    vocab = F.array(*[F.lit(s) for s in states])
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).cast("timestamp"), F.col(order_col)
    )
    # array_position is 1-based, 0 when absent
    fi = F.array_position(vocab, F.col(state_col)) - 1
    ti = F.array_position(vocab, F.lead(state_col).over(w)) - 1
    pairs = (
        df.withColumn("_fi", fi)
        .withColumn("_ti", ti)
        .where((F.col("_fi") >= 0) & (F.col("_ti") >= 0))
        .select(
            F.col(key_col),
            (F.col("_fi") * k + F.col("_ti")).cast("int").alias("_idx"),
        )
    )
    counts = pairs.groupBy(key_col, "_idx").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    per_key = counts.groupBy(key_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_idx"), F.col("_c")))
        ).alias("_m"),
        F.sum("_c").cast("long").alias("n_transitions"),
    )
    # try_element_at: the transition map is SPARSE by construction
    # (most of the k*k cells are unobserved), and ANSI mode makes map
    # element_at throw on a missing key (hll_sketch convention)
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(k * k - 1)),
        lambda i: F.coalesce(
            F.try_element_at(F.col("_m"), i.cast("int")),
            F.lit(0).cast("long"),
        ).cast("double")
        / F.col("n_transitions").cast("double"),
    )
    return per_key.select(
        F.col(key_col), vec.alias("behavior"), F.col("n_transitions")
    )
