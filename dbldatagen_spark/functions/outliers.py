"""Robust numeric-outlier handling for feature and metric columns.

Training-data pipelines clip (winsorize) heavy-tailed numeric features
before normalization, and monitoring flags rows outside robust fences.
Both decompose into one exact-quantile aggregation (a single reduce to a
few doubles) broadcast back over the scan — no second shuffle, no UDF.

Spark's ``percentile`` is the exact linear-interpolation estimator
(matching DuckDB's ``quantile_cont``), so the clip thresholds — and
therefore every clipped value — are engine-portable bit-for-bit.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _join_group_stats(df: DataFrame, stats: DataFrame, by: str) -> DataFrame:
    """Broadcast-join per-group stats back onto the scan, null-safely:
    a plain equi-join on the group column silently DROPS rows whose
    group is NULL (their stats row exists — groupBy keeps a NULL
    group — but ``=`` never matches NULL). The stats key is renamed
    first so the join never mis-resolves against the input's own
    column (both frames share lineage)."""
    st = stats.withColumnRenamed(by, "_grp_key")
    return df.join(
        F.broadcast(st), df[by].eqNullSafe(F.col("_grp_key"))
    ).drop("_grp_key")


def winsorize(
    df: DataFrame,
    value_col: str,
    *,
    lower_q: float = 0.01,
    upper_q: float = 0.99,
    by: Optional[str] = None,
    out_col: Optional[str] = None,
) -> DataFrame:
    """Clip ``value_col`` to its exact [``lower_q``, ``upper_q``]
    quantile range — globally, or per ``by`` group.

    Adds ``out_col`` (default ``{value_col}_winsorized``) plus the
    thresholds used (``_clip_lo`` / ``_clip_hi`` columns), leaving the
    original column untouched so the clip is auditable.

    Plan shape: one exact-percentile aggregation (global: a single
    all-reduce to two doubles joined back by broadcast; grouped: one
    map-side-combined hash aggregation on the group key joined back by
    broadcast when small, hash join otherwise) followed by a map-only
    ``least/greatest``. The value column itself never shuffles.
    """
    if not 0.0 <= lower_q < upper_q <= 1.0:
        raise ValueError(
            f"need 0 <= lower_q < upper_q <= 1, got ({lower_q}, {upper_q})"
        )
    out = out_col or f"{value_col}_winsorized"
    v = F.col(value_col).cast("double")
    agg = [
        F.expr(f"percentile({value_col}, {lower_q!r})").alias("_clip_lo"),
        F.expr(f"percentile({value_col}, {upper_q!r})").alias("_clip_hi"),
    ]
    if by is None:
        clips = df.agg(*agg)
        joined = df.crossJoin(F.broadcast(clips))
    else:
        clips = df.groupBy(by).agg(*agg)
        joined = _join_group_stats(df, clips, by)
    return joined.withColumn(
        out, F.least(F.greatest(v, F.col("_clip_lo")), F.col("_clip_hi"))
    )


def robust_outlier_flags(
    df: DataFrame,
    value_col: str,
    *,
    k: float = 1.5,
    by: Optional[str] = None,
) -> DataFrame:
    """Tukey-fence outlier flags: mark rows outside
    ``[q1 - k*iqr, q3 + k*iqr]`` (``k=1.5`` classic, ``3.0`` "far out"),
    globally or per ``by`` group.

    Adds ``is_outlier`` plus the fences (``_fence_lo`` / ``_fence_hi``).
    Same single-aggregation + broadcast-back shape as :func:`winsorize`;
    exact interpolated quartiles keep the fences engine-portable.
    """
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    q1 = F.expr(f"percentile({value_col}, 0.25)")
    q3 = F.expr(f"percentile({value_col}, 0.75)")
    agg = [
        (q1 - (q3 - q1) * F.lit(float(k))).alias("_fence_lo"),
        (q3 + (q3 - q1) * F.lit(float(k))).alias("_fence_hi"),
    ]
    if by is None:
        fences = df.agg(*agg)
        joined = df.crossJoin(F.broadcast(fences))
    else:
        fences = df.groupBy(by).agg(*agg)
        joined = _join_group_stats(df, fences, by)
    v = F.col(value_col).cast("double")
    return joined.withColumn(
        "is_outlier",
        (v < F.col("_fence_lo")) | (v > F.col("_fence_hi")),
    )


def zscore_normalize(
    df: DataFrame,
    value_col: str,
    *,
    by: Optional[str] = None,
    out_col: Optional[str] = None,
    robust: bool = False,
) -> DataFrame:
    """Standardize ``value_col`` to zero mean / unit variance — globally
    or per ``by`` group. ``robust=True`` uses median and IQR instead
    (median-centered, IQR-scaled — insensitive to the tails that motivate
    winsorizing in the first place).

    Adds ``out_col`` (default ``{value_col}_z``) plus the center/scale
    used (``_center`` / ``_scale``). Degenerate groups (zero variance or
    zero IQR) produce 0.0, not NULL/inf.

    Same plan shape as :func:`winsorize`: one bounded aggregation
    broadcast back over the scan; the value column never shuffles.
    ``stddev_pop`` (not sample) so a one-row group is its own center.
    """
    out = out_col or f"{value_col}_z"
    v = F.col(value_col).cast("double")
    if robust:
        center = F.expr(f"percentile({value_col}, 0.5)")
        scale = F.expr(f"percentile({value_col}, 0.75)") - F.expr(
            f"percentile({value_col}, 0.25)"
        )
    else:
        center = F.avg(v)
        scale = F.stddev_pop(v)
    agg = [center.alias("_center"), scale.alias("_scale")]
    if by is None:
        stats = df.agg(*agg)
        joined = df.crossJoin(F.broadcast(stats))
    else:
        stats = df.groupBy(by).agg(*agg)
        joined = _join_group_stats(df, stats, by)
    return joined.withColumn(
        out,
        F.when(F.col("_scale") > 0, (v - F.col("_center")) / F.col("_scale"))
        .otherwise(F.lit(0.0)),
    )


def quantile_bucket(
    df: DataFrame,
    value_col: str,
    num_buckets: int,
    *,
    by: Optional[str] = None,
    out_col: Optional[str] = None,
) -> DataFrame:
    """Assign each row its quantile bucket in ``1..num_buckets`` — the
    scale-safe NTILE: instead of a single global sort (what
    ``ntile() OVER (ORDER BY ...)`` costs — one task owns the whole
    ordering), compute the ``num_buckets - 1`` exact interior quantile
    cut points in one bounded aggregation, broadcast them, and bucket
    each row with a count of thresholds at or below its value.

    Ties collapse onto the same bucket (rows with equal values always
    land together — unlike NTILE, which splits ties to equalize bucket
    sizes; bucket populations are therefore only approximately equal
    under heavy ties, which is the correct behavior for feature
    binning). Exact interpolated quantiles keep bucket edges
    engine-portable.
    """
    if num_buckets < 2:
        raise ValueError(f"num_buckets must be >= 2, got {num_buckets}")
    out = out_col or f"{value_col}_bucket"
    qs = [i / num_buckets for i in range(1, num_buckets)]
    agg = [
        F.expr(f"percentile({value_col}, {q!r})").alias(f"_q{i}")
        for i, q in enumerate(qs)
    ]
    if by is None:
        cuts = df.agg(*agg)
        joined = df.crossJoin(F.broadcast(cuts))
    else:
        cuts = df.groupBy(by).agg(*agg)
        joined = _join_group_stats(df, cuts, by)
    v = F.col(value_col).cast("double")
    bucket = F.lit(1)
    for i in range(len(qs)):
        bucket = bucket + (v > F.col(f"_q{i}")).cast("int")
    return joined.withColumn(out, bucket).drop(
        *[f"_q{i}" for i in range(len(qs))]
    )
