"""Event-time rate limiting — the token-bucket admission decision.

"Allow at most N events per key per trailing window W" is genuinely
recursive: whether an event is admitted depends on which EARLIER events
were admitted, so no plain window aggregation expresses it. Two
implementations share exact semantics:

- batch: each key's time-sorted events fold through ``F.aggregate``
  carrying the admitted-epoch list (pruned to the trailing window) and
  the per-event decisions — one shuffle on the key, no UDF;
- streaming: :func:`dbldatagen_spark.streaming.stateful` hosts the
  per-key state twin.

Decision rule: an event at time t is ADMITTED iff fewer than
``max_events`` admitted events have times in ``(t - window, t]``; ties
at equal timestamps process in ``order_col`` order. The admitted set is
therefore deterministic under any partitioning — and reproducible by
any engine with a list fold, which is what the oracle does.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbldatagen_spark.functions.timeseries import (
    DEFAULT_MAX_EVENTS_APPEND_FOLD,
    _check_fold_size,
    _divert_oversized_keys,
)


def rate_limit_events(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    max_events: int,
    window_seconds: int,
    order_col: str,
    max_events_per_key: Optional[int] = DEFAULT_MAX_EVENTS_APPEND_FOLD,
    on_oversized: str = "error",
) -> DataFrame:
    """Per-event admission decisions for the trailing-window rate limit.

    Returns the input's ``(key, order_col)`` pairs plus ``allowed``
    (boolean) — join back on ``order_col`` for full rows. Scale shape:
    ONE shuffle on the key; the fold state is at most ``max_events``
    admitted epochs (older ones are pruned as the window slides), so
    per-row work is O(max_events) regardless of history length — but
    the decisions array appends per event (quadratic element copies on
    one hot key), so ``max_events_per_key`` (default
    ``timeseries.DEFAULT_MAX_EVENTS_APPEND_FOLD``) guards it: the
    default ``on_oversized="error"`` fails loudly naming viral keys;
    ``"divert"`` drops them before their array builds — audit with
    ``timeseries.fold_key_report`` and point hot keys at the
    streaming twin.  ``None`` opts out.  The ``"error"`` default is
    enforced in-plan at the fold's own aggregation — no extra job,
    fully lazy (see ``timeseries.ewma``).
    """
    if max_events < 1:
        raise ValueError(f"max_events must be >= 1, got {max_events}")
    if window_seconds <= 0:
        raise ValueError(
            f"window_seconds must be positive, got {window_seconds}"
        )
    w = F.lit(int(window_seconds)).cast("long")
    n = F.lit(int(max_events))
    epoch = F.floor(
        F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    ).cast("long")

    per_key = _divert_oversized_keys(
        df.select(
            F.col(key_col).alias("_k"),
            F.struct(
                epoch.alias("e"),
                F.col(order_col).cast("long").alias("o"),
            ).alias("_ev"),
        ),
        "_k",
        max_events_per_key,
        on_oversized,
    ).groupBy("_k").agg(F.array_sort(F.collect_list("_ev")).alias("_evts"))
    per_key = _check_fold_size(
        per_key, "_evts", "_k", max_events_per_key, on_oversized,
        "rate_limit_events",
    )

    init = F.struct(
        F.array().cast("array<bigint>").alias("adm"),
        F.array().cast("array<struct<o:bigint,allowed:boolean>>").alias(
            "out"
        ),
    )

    def _step(acc, ev):
        recent = F.filter(acc["adm"], lambda a: a > ev["e"] - w)
        ok = F.size(recent) < n
        return F.struct(
            # keep only the window-relevant admitted epochs: state stays
            # O(max_events), not O(history)
            F.when(ok, F.concat(recent, F.array(ev["e"])))
            .otherwise(recent)
            .alias("adm"),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(ev["o"].alias("o"), ok.alias("allowed"))
                ),
            ).alias("out"),
        )

    folded = per_key.select(
        "_k", F.aggregate(F.col("_evts"), init, _step)["out"].alias("_out")
    )
    return folded.select(
        F.col("_k").alias(key_col),
        F.explode_outer("_out").alias("_d"),
    ).where(F.col("_d").isNotNull()).select(
        key_col,
        F.col("_d.o").alias(order_col),
        F.col("_d.allowed").alias("allowed"),
    )
