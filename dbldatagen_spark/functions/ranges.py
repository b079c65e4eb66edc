"""Range (point-in-interval) join — an operator Spark's join syntax only
expresses as a theta join.

``JOIN ON p.ts BETWEEN i.start AND i.end`` compiles to a broadcast
nested-loop (right side small) or a cartesian product (right side large) —
O(|points| x |intervals|) comparisons either way. This implementation uses
bucket blocking instead:

1. pick a bucket width (seconds); each point belongs to exactly one bucket
   ``floor(epoch(ts) / width)``;
2. explode each interval into the buckets it covers (``F.sequence`` over
   the bucket range — bounded row amplification of
   ``len(interval)/width + 1`` per interval);
3. equi-join on (equi keys…, bucket id) — an ordinary hash shuffle join
   Catalyst can plan, with AQE skew handling — then re-check the exact
   containment predicate.

Because a point sits in exactly one bucket, no output dedup is needed.
Cost at scale: one shuffle of points + exploded intervals; width tunes the
amplification/selectivity trade-off (wide buckets → fewer interval copies
but more false candidates to filter).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    equi_keys: Sequence[str] = (),
    bucket_width_seconds: int = 3600,
    how: str = "inner",
    max_covered_buckets: Optional[int] = 10_000,
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point <= end`` (and equal ``equi_keys``, if given).

    Output columns: all of ``points``' columns plus ``intervals``' columns
    (names must not collide apart from the equi keys, which are kept once).
    ``how`` may be ``inner`` or ``left`` (left keeps pointless rows with
    null interval columns).

    ``max_covered_buckets`` guards runaway amplification: an interval
    longer than ``width x max_covered_buckets`` raises at plan time rather
    than exploding a partition at runtime (pass None to disable).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if bucket_width_seconds <= 0:
        raise ValueError("bucket_width_seconds must be positive")
    equi_keys = list(equi_keys)
    overlap = set(points.columns) & set(intervals.columns) - set(equi_keys)
    if overlap:
        raise ValueError(
            f"column collision outside equi keys: {sorted(overlap)}"
        )

    w = F.lit(int(bucket_width_seconds))
    p_bucket = F.floor(F.col(point_col).cast("double") / w)
    i_first = F.floor(F.col(start_col).cast("double") / w)
    i_last = F.floor(F.col(end_col).cast("double") / w)

    if max_covered_buckets is not None:
        # fail loudly on the first oversized interval instead of silently
        # materializing an unbounded F.sequence; the guard lives inside the
        # sequence bound so Catalyst cannot prune it away
        i_last = F.when(
            i_last - i_first >= int(max_covered_buckets),
            F.raise_error(
                F.concat(
                    F.lit("range_join: interval covers too many buckets: "),
                    (i_last - i_first + 1).cast("string"),
                )
            ).cast("bigint"),
        ).otherwise(i_last)
    iv = intervals.select(
        "*", F.explode_outer(F.sequence(i_first, i_last)).alias("_bucket")
    ).where(F.col("_bucket").isNotNull())
    pts = points.withColumn("_bucket", p_bucket)

    on = [*equi_keys, "_bucket"]
    contained = (F.col(point_col) >= F.col(start_col)) & (
        F.col(point_col) <= F.col(end_col)
    )
    if how == "inner":
        return pts.join(iv, on=on, how="inner").where(contained).drop("_bucket")
    # left join: apply the containment check as part of the join condition so
    # non-matching points survive with nulls (a post-filter would drop them)
    iv2 = iv
    for k in on:
        iv2 = iv2.withColumnRenamed(k, f"_r_{k}")
    cond = contained
    for k in on:
        cond = cond & (F.col(k) == F.col(f"_r_{k}"))
    joined = pts.join(iv2, cond, "left")
    return joined.drop(*[f"_r_{k}" for k in on], "_bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    equi_keys: Sequence[str] = (),
    bucket_width_seconds: int = 3600,
    max_covered_buckets: Optional[int] = 10_000,
) -> DataFrame:
    """Inner-join interval pairs that OVERLAP: rows where
    ``[left_start, left_end]`` and ``[right_start, right_end]``
    intersect (closed intervals, and equal ``equi_keys`` if given) —
    the interval-x-interval generalization of :func:`range_join`.

    Same bucket-blocking scheme, applied to both sides: each interval
    explodes into the buckets it covers, candidates meet through an
    ordinary hash equi-join on (keys…, bucket), and the exact overlap
    predicate re-checks. A pair of overlapping intervals co-covers every
    bucket of their intersection, so to emit each pair exactly once
    WITHOUT a distinct (which would shuffle the whole output), the join
    keeps only the canonical bucket — the one containing the
    intersection's start, ``floor(max(starts) / width)``. Every
    overlapping pair has exactly one such bucket; non-overlapping
    bucket-mates fail the overlap predicate.

    Cost at scale: one shuffle of both exploded sides (amplification
    ``len/width + 1`` per interval, guarded by ``max_covered_buckets``
    exactly as in :func:`range_join`); no dedup stage, no cartesian.
    """
    if bucket_width_seconds <= 0:
        raise ValueError("bucket_width_seconds must be positive")
    equi_keys = list(equi_keys)
    collide = set(left.columns) & set(right.columns) - set(equi_keys)
    if collide:
        raise ValueError(
            f"column collision outside equi keys: {sorted(collide)}"
        )

    w = F.lit(int(bucket_width_seconds))

    def _explode(df, start_col, end_col):
        first = F.floor(F.col(start_col).cast("double") / w)
        last = F.floor(F.col(end_col).cast("double") / w)
        if max_covered_buckets is not None:
            last = F.when(
                last - first >= int(max_covered_buckets),
                F.raise_error(
                    F.concat(
                        F.lit(
                            "interval_overlap_join: interval covers too"
                            " many buckets: "
                        ),
                        (last - first + 1).cast("string"),
                    )
                ).cast("bigint"),
            ).otherwise(last)
        return df.select(
            "*", F.explode_outer(F.sequence(first, last)).alias("_bucket")
        ).where(F.col("_bucket").isNotNull())

    lv = _explode(left, left_start, left_end)
    rv = _explode(right, right_start, right_end)

    overlaps = (F.col(left_start) <= F.col(right_end)) & (
        F.col(right_start) <= F.col(left_end)
    )
    canonical = F.col("_bucket") == F.floor(
        F.greatest(
            F.col(left_start).cast("double"), F.col(right_start).cast("double")
        )
        / w
    )
    return (
        lv.join(rv, on=[*equi_keys, "_bucket"], how="inner")
        .where(overlaps & canonical)
        .drop("_bucket")
    )
