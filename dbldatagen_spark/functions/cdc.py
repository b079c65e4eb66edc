"""Change-data-capture application — changelog stream -> current state.

The generation side of this engine emits MERGE scripts (the reference's
CDC story); this is the consuming half: given a changelog of
upsert/delete operations with a monotonic sequence per key, materialize
the table's current state. The whole operator is one shuffle on the key
with a top-1-per-key rank that Spark rewrites to ``WindowGroupLimit``
(per-map-task head before the exchange), so a key with millions of
updates ships one candidate row per input partition, never its history.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_cdc(
    ops: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    *,
    op_col: str = "op",
    delete_ops: Tuple[str, ...] = ("D", "DELETE", "delete"),
    keep_op_cols: bool = False,
) -> DataFrame:
    """Reduce a changelog to current state: for each key keep the row
    with the highest ``seq_col``; if that winning operation is a delete,
    the key is absent from the output.

    ``seq_col`` must be unique per key (a log sequence number /
    commit timestamp + tiebreaker) — it is what makes the reduction
    deterministic under any partitioning. ``op_col`` values in
    ``delete_ops`` mark tombstones; everything else is an upsert.
    ``keep_op_cols=False`` (default) drops the op and sequence columns
    from the result, leaving the payload schema.

    Scale shape: single hash shuffle on the key; the descending-seq
    top-1 plans as a pre-exchange ``WindowGroupLimit``. Late-arriving
    changes are handled by re-running over the extended log (the
    reduction is associative: max-seq over any union of log segments).
    """
    if not key_cols:
        raise ValueError("key_cols must name at least one key column")
    keys = [F.col(k) for k in key_cols]
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    latest = (
        ops.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    # NULL op is an upsert, not a silent drop: bare ~isin evaluates to
    # NULL on NULL input and the filter would discard the key entirely
    is_delete = F.coalesce(
        F.col(op_col).isin(list(delete_ops)), F.lit(False)
    )
    alive = latest.where(~is_delete)
    return alive if keep_op_cols else alive.drop(op_col, seq_col)


def cdc_change_counts(
    ops: DataFrame,
    key_cols: Sequence[str],
    *,
    op_col: str = "op",
) -> DataFrame:
    """Per-operation changelog profile: one row per op value with the
    operation count and the number of distinct keys it touched —
    the sanity report run before applying a day's changelog (a delete
    storm or a single hot key shows up here first).

    One map-side-combined aggregation on (op, key) then a bounded
    re-aggregation per op; only keys and the op tag shuffle.
    """
    if not key_cols:
        raise ValueError("key_cols must name at least one key column")
    per_key = ops.groupBy(op_col, *[F.col(k) for k in key_cols]).agg(
        F.count(F.lit(1)).alias("_n")
    )
    return (
        per_key.groupBy(op_col)
        .agg(
            F.sum("_n").cast("long").alias("n_ops"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
        )
        .orderBy(op_col)
    )


def derive_cdc(
    before: DataFrame,
    after: DataFrame,
    key_cols: Sequence[str],
    *,
    compare_cols: Sequence[str] | None = None,
    op_col: str = "op",
    include_unchanged: bool = False,
) -> DataFrame:
    """The inverse of :func:`apply_cdc`: given two keyed snapshots of
    the same table, derive the changelog that turns ``before`` into
    ``after`` — one row per changed key with ``op_col`` in
    ``'I'`` (key only in ``after``), ``'D'`` (only in ``before``),
    ``'U'`` (present in both, compared payload differs). Unchanged keys
    are dropped unless ``include_unchanged=True`` (then tagged ``'N'``).
    This is snapshot-diff CDC derivation — the path used when the
    upstream system can't emit a changelog and all you get is
    yesterday's and today's table.

    ``compare_cols`` defaults to every non-key column the two frames
    share (in ``after``'s column order). Keys are assumed unique per
    snapshot (it's a keyed table); with duplicates the comparison uses
    the max payload fingerprint per side — deterministic, but fix the
    input.

    Scale shape: each side is reduced map-side to
    ``(keys…, xxhash64(to_json(payload-struct)))`` — 8 bytes of
    fingerprint instead of the payload — so the single union+groupBy
    shuffle moves keys and hashes only; a wide table diffs at the cost
    of a narrow one. ``to_json`` (not a bare struct hash) because
    Spark's hash functions skip NULL fields, which would collide
    ``(NULL, x)`` with ``(x, NULL)``; JSON keeps field positions
    distinct. Known edge: payloads differing only as ``0.0`` vs
    ``-0.0`` serialize differently and flag ``'U'`` — the safe
    direction (a spurious update, never a missed change). No full
    outer join anywhere (a snapshot diff as FULL OUTER JOIN
    sort-merges two full tables; the union+groupBy shape is one
    exchange of hashes and AQE-friendly).
    """
    if not key_cols:
        raise ValueError("key_cols must name at least one key column")
    keys = list(key_cols)
    if compare_cols is None:
        compare_cols = [
            c for c in after.columns if c not in keys and c in before.columns
        ]
    if not compare_cols:
        raise ValueError("no compare columns: snapshots share no non-key columns")
    for side, frame in (("before", before), ("after", after)):
        missing = [
            c for c in list(keys) + list(compare_cols) if c not in frame.columns
        ]
        if missing:
            raise ValueError(f"columns missing from {side} snapshot: {missing}")

    def _fingerprinted(df: DataFrame, tag: int) -> DataFrame:
        return df.select(
            *[F.col(k) for k in keys],
            F.xxhash64(
                F.to_json(F.struct(*[F.col(c) for c in compare_cols]))
            ).alias("_h"),
            F.lit(tag).alias("_src"),
        )

    u = _fingerprinted(before, 0).unionByName(_fingerprinted(after, 1))
    g = u.groupBy(*[F.col(k) for k in keys]).agg(
        F.max(F.when(F.col("_src") == 0, F.col("_h"))).alias("_hb"),
        F.max(F.when(F.col("_src") == 1, F.col("_h"))).alias("_ha"),
    )
    op = (
        F.when(F.col("_hb").isNull(), F.lit("I"))
        .when(F.col("_ha").isNull(), F.lit("D"))
        .when(F.col("_hb") != F.col("_ha"), F.lit("U"))
        .otherwise(F.lit("N"))
    )
    out = g.select(*keys, op.alias(op_col))
    if not include_unchanged:
        out = out.where(F.col(op_col) != "N")
    return out


def mergeable_aggregate(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Per-key mergeable aggregate state:
    ``(keys…, n, sum, min, max)`` — the decomposition that makes an
    aggregation incrementally maintainable (avg = sum/n is derived at
    read time, never stored). One map-side-combined hash aggregation.
    """
    if not key_cols:
        raise ValueError("key_cols must name at least one key column")
    v = F.col(value_col).cast("double")
    return df.groupBy(*[F.col(k) for k in key_cols]).agg(
        F.count(v).cast("long").alias("n"),
        F.sum(v).alias("sum"),
        F.min(v).alias("min"),
        F.max(v).alias("max"),
    )


def merge_aggregates(
    old: DataFrame,
    delta: DataFrame,
    key_cols: Sequence[str],
) -> DataFrame:
    """Merge two mergeable-aggregate states (both in
    :func:`mergeable_aggregate`'s schema) into one — the incremental
    path: yesterday's state + today's batch state, without rescanning
    yesterday's data. Count/sum add, min/max combine; keys present in
    only one side pass through.

    The merge is associative and commutative, so daily states fold in
    any order and any grouping — re-running over the union of N deltas
    equals N successive merges (the invariant pytest asserts). One
    shuffle of two *state* frames (a row per key, not per event); the
    full outer join plans sort-merge DELIBERATELY — both sides are
    key-scale state tables, so a keyed merge is the right physical
    shape (a broadcast would assume one side stays small, which state
    tables don't).
    """
    if not key_cols:
        raise ValueError("key_cols must name at least one key column")
    keys = list(key_cols)
    o = old.select(
        *keys,
        F.col("n").alias("_on"),
        F.col("sum").alias("_os"),
        F.col("min").alias("_omin"),
        F.col("max").alias("_omax"),
    )
    d = delta.select(
        *keys,
        F.col("n").alias("_dn"),
        F.col("sum").alias("_ds"),
        F.col("min").alias("_dmin"),
        F.col("max").alias("_dmax"),
    )
    j = o.join(d, keys, "full")
    zero = F.lit(0).cast("long")
    return j.select(
        *keys,
        (F.coalesce(F.col("_on"), zero) + F.coalesce(F.col("_dn"), zero)).alias(
            "n"
        ),
        (
            F.coalesce(F.col("_os"), F.lit(0.0))
            + F.coalesce(F.col("_ds"), F.lit(0.0))
        ).alias("sum"),
        F.least(
            F.coalesce(F.col("_omin"), F.col("_dmin")),
            F.coalesce(F.col("_dmin"), F.col("_omin")),
        ).alias("min"),
        F.greatest(
            F.coalesce(F.col("_omax"), F.col("_dmax")),
            F.coalesce(F.col("_dmax"), F.col("_omax")),
        ).alias("max"),
    )
