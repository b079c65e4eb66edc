"""Slowly-changing-dimension (SCD Type 2) operators.

Training pipelines and warehouses both need "what was this attribute at
time T" — label joins against feature snapshots, entitlement lookups,
per-user configuration history. The classic preparation is change-event
stream -> validity intervals -> point-in-time lookup. Spark has no SCD
verb; both halves compose from windows and one equi-join:

- interval building is two per-key ordered windows (change detection by
  ``lag``, interval close by ``lead``) — the shuffle is one hash
  partition on the key and both windows reuse it;
- the point-in-time lookup is an equi-join on the key with the interval
  containment as a post-join filter, so Catalyst plans an ordinary
  hash/broadcast join (each probe matches exactly one interval, so the
  filter never amplifies rows).

No UDF anywhere; every timestamp comparison is engine-portable.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: Sequence[str],
    *,
    order_col: Optional[str] = None,
) -> DataFrame:
    """Collapse a change-event stream into SCD Type-2 validity intervals.

    For each key, events ordered by ``ts_col`` (ties broken by
    ``order_col``, a unique column such as an event id — required for a
    deterministic result when timestamps collide) are scanned for
    attribute changes; consecutive events whose ``attr_cols`` are all
    equal collapse into one interval. Returns one row per
    (key, attribute version):

    ``(key, *attrs, effective_from, effective_to, is_current, version)``

    where ``effective_to`` is the next version's ``effective_from``
    (NULL on the current/open version — the half-open convention
    ``[from, to)``) and ``version`` numbers versions per key from 1.

    Scale shape: one shuffle on the key; the change-detection ``lag``,
    the interval-close ``lead``, and the version ``sum`` all reuse that
    partitioning, so the whole operator is a single exchange followed by
    one sort — per-key history fits a task because SCD keys are users /
    devices / accounts, not documents. NULL attribute values compare
    equal to NULL (a NULL->NULL step is no change), matching warehouse
    MERGE semantics.
    """
    if not attr_cols:
        raise ValueError("attr_cols must name at least one tracked attribute")
    order = [F.col(ts_col)] + ([F.col(order_col)] if order_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)

    # change flag: any tracked attribute differs from the previous event
    # (null-safe so NULL -> NULL is "no change")
    changed = F.lit(False)
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(F.col(a)).over(w))
    changed = F.when(F.lag(F.col(ts_col)).over(w).isNull(), F.lit(True)).otherwise(
        changed
    )

    versions = (
        df.withColumn("_chg", changed.cast("int"))
        .withColumn("_ver", F.sum("_chg").over(w))
        .where(F.col("_chg") == 1)
    )
    wv = Window.partitionBy(key_col).orderBy("_ver")
    return (
        versions.select(
            F.col(key_col),
            *[F.col(a) for a in attr_cols],
            F.col(ts_col).alias("effective_from"),
            F.lead(F.col(ts_col)).over(wv).alias("effective_to"),
            F.col("_ver").cast("long").alias("version"),
        )
        .withColumn("is_current", F.col("effective_to").isNull())
    )


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    key_col: str,
    probe_ts_col: str,
    *,
    from_col: str = "effective_from",
    to_col: str = "effective_to",
    how: str = "left",
    broadcast_dim: bool = False,
) -> DataFrame:
    """Point-in-time join: enrich each fact row with the dimension
    version valid at its timestamp.

    Matches ``dim`` rows where ``facts.probe_ts`` falls in the half-open
    interval ``[from_col, to_col)`` (open ``to_col`` = NULL matches
    everything at or after ``from_col``). Because SCD2 intervals are
    disjoint per key, each fact matches at most one version, so the join
    never amplifies.

    Plan shape: an equi-join on the key with the containment predicate
    as the join condition's residual filter — Catalyst keeps the hash
    join (broadcast when ``broadcast_dim`` or the dim is under the AQE
    threshold) and evaluates containment post-probe. For a 100-TB fact
    side this is one shuffle of the fact keys or zero with a broadcast
    dim; never a cartesian.
    """
    # rename the dim key before joining: when dim derives from the same
    # source as facts, drop(d[key_col]) can resolve to the FACT key and
    # null it on unmatched left rows
    dim_r = dim.withColumnRenamed(key_col, "_scd2_key")
    d = F.broadcast(dim_r) if broadcast_dim else dim_r
    probe = facts[probe_ts_col]
    cond = (
        (facts[key_col] == d["_scd2_key"])
        & (probe >= d[from_col])
        & (d[to_col].isNull() | (probe < d[to_col]))
    )
    return facts.join(d, cond, how).drop("_scd2_key")


def scd2_validate(
    dim: DataFrame,
    key_col: str,
    *,
    from_col: str = "effective_from",
    to_col: str = "effective_to",
) -> DataFrame:
    """Integrity check for an externally-supplied SCD2 dimension —
    the QA gate before trusting someone else's interval table in a
    point-in-time join. Returns one row per violation:

    ``(key, effective_from, violation)`` with ``violation`` in

    - ``inverted``        — ``to <= from`` (empty or negative interval)
    - ``overlap``         — interval starts before the previous one ends
    - ``gap``             — interval starts after the previous one ends
      (a hole in history: lookups in the hole silently miss)
    - ``multiple_current``— more than one open (NULL ``to``) version

    A clean dimension returns zero rows; :func:`scd2_intervals` output
    is clean by construction. One shuffle on the key; the ordered lag
    and the open-version count share the partitioning. The half-open
    convention ``[from, to)`` is assumed: back-to-back intervals where
    ``from == prev_to`` are correct (neither gap nor overlap).
    """
    w = Window.partitionBy(key_col).orderBy(F.col(from_col))
    prev_to = F.lag(F.col(to_col)).over(w)
    n_open = F.sum(
        F.col(to_col).isNull().cast("int")
    ).over(Window.partitionBy(key_col))

    checked = dim.select(
        F.col(key_col).alias("key"),
        F.col(from_col).alias("effective_from"),
        F.col(to_col).alias("_to"),
        prev_to.alias("_prev_to"),
        n_open.alias("_n_open"),
    )
    inverted = checked.where(
        F.col("_to").isNotNull() & (F.col("_to") <= F.col("effective_from"))
    ).select("key", "effective_from", F.lit("inverted").alias("violation"))
    overlap = checked.where(
        F.col("_prev_to").isNotNull()
        & (F.col("effective_from") < F.col("_prev_to"))
    ).select("key", "effective_from", F.lit("overlap").alias("violation"))
    gap = checked.where(
        F.col("_prev_to").isNotNull()
        & (F.col("effective_from") > F.col("_prev_to"))
    ).select("key", "effective_from", F.lit("gap").alias("violation"))
    multi = (
        checked.where(F.col("_n_open") > 1)
        .where(F.col("_to").isNull())
        .select(
            "key",
            "effective_from",
            F.lit("multiple_current").alias("violation"),
        )
    )
    return (
        inverted.union(overlap)
        .union(gap)
        .union(multi)
        .orderBy("key", "effective_from", "violation")
    )
