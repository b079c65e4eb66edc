"""KMV (k-minimum-values) distinct-count sketches.

``approx_count_distinct`` is Spark's HLL and is neither mergeable across
engines nor replayable by an external oracle.  KMV (Bar-Yossef et al.
2002, "Counting distinct elements in a data stream") is the portable
alternative: hash every value to a uniform in ``[0, 1)``, keep the ``k``
smallest distinct hashes, and estimate the distinct count as
``(k - 1) / u_(k)`` where ``u_(k)`` is the k-th smallest.  With fewer
than ``k`` distinct hashes the sketch IS the exact distinct set.

Why it earns a place next to the built-in: the sketch is a plain
``array<long>`` column — mergeable by re-minning the union
(:func:`kmv_merge_expr`), storable in any table, and bit-reproducible in
any engine with ``md5`` (the repo's portable-hash idiom), so a DuckDB
oracle recomputes estimates exactly.

Scale shape: per-group candidate pruning uses ``row_number() <= k``
over ``(group ORDER BY hash)``, which Spark plans as a pre-exchange
``WindowGroupLimit`` — each map task forwards at most ``k`` rows per
group, so the sort/exchange sees ``O(groups * k)`` rows no matter how
many distinct values exist.  Values themselves never shuffle, only
8-byte hashes.

Reference parity: dbldatagen has no sketch surface; this supports the
corpus-statistics side of the training-data toolkit (``corpus_stats``
uses HLL internally — KMV is the auditable twin).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["kmv_hash_expr", "kmv_sketch", "kmv_merge_expr", "kmv_estimate_expr"]

_TWO_60 = float(1 << 60)


def kmv_hash_expr(value: Column, *, seed: int = 0) -> Column:
    """60-bit md5-derived hash of ``value`` as a non-negative long —
    the engine-portable uniform basis (DuckDB twin:
    ``('0x' || substr(md5(seed || ':' || v), 1, 15))::BIGINT``)."""
    return F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(seed), value.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")


def kmv_estimate_expr(sketch: Column, k: int) -> Column:
    """Distinct-count estimate from a sketch array of minimum hashes:
    exact cardinality below ``k``, else ``(k - 1) / u_(k)`` with
    ``u_(k) = (h_(k) + 0.5) / 2^60``."""
    kth_u = (F.element_at(sketch, k).cast("double") + F.lit(0.5)) / F.lit(_TWO_60)
    return F.when(
        F.size(sketch) < k, F.size(sketch).cast("double")
    ).otherwise(F.lit(float(k - 1)) / kth_u)


def kmv_merge_expr(sketches: Column, k: int) -> Column:
    """Merge an ``array<array<long>>`` of sketches into one: distinct
    hashes of the union, sorted, first ``k``.  Associative and
    commutative — the lossless union bound any mergeable-aggregate
    pipeline needs (cf. :mod:`dbldatagen_spark.functions.mergeable`)."""
    return F.slice(F.array_sort(F.array_distinct(F.flatten(sketches))), 1, k)


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    *,
    group_cols: Optional[Sequence[str]] = None,
    k: int = 64,
    seed: int = 0,
) -> DataFrame:
    """Per-group KMV sketch of ``value_col``'s distinct count.  Returns
    ``group_cols + (sketch array<long>, n_kept, dv_estimate)``.  NULL
    values are excluded (``COUNT(DISTINCT)`` semantics).

    Plan: distinct ``(group, hash)`` hash-agg (map-side combine) —
    only 8-byte hashes shuffle — then ``row_number() <= k`` planned as
    pre-exchange ``WindowGroupLimit``, then a bounded ``collect_list``
    (at most ``k`` entries per group) folded into the estimate.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    groups = list(group_cols or [])
    hashed = (
        df.where(F.col(value_col).isNotNull())
        .select(*groups, kmv_hash_expr(F.col(value_col), seed=seed).alias("_h"))
        .distinct()
    )
    if groups:
        w = Window.partitionBy(*groups).orderBy("_h")
    else:
        w = Window.partitionBy(F.lit(1)).orderBy("_h")
    kept = hashed.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    agg = kept.groupBy(*groups).agg(
        F.array_sort(F.collect_list("_h")).alias("sketch"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
    )
    return agg.withColumn("dv_estimate", kmv_estimate_expr(F.col("sketch"), k))
