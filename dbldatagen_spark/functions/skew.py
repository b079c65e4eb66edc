"""Skew-resistant join: salting for hot keys.

A shuffle join hash-partitions both sides on the join key; one hot key
(a null-ish default, a celebrity user, an empty-string bucket) lands an
entire partition on one task and the stage runs at the speed of that
straggler. AQE's skew-join handling splits oversized *partitions* of a
sort-merge join at runtime, but it cannot split a single key's rows for
a shuffled hash join, and it never helps aggregations feeding the join.

``salted_join`` applies the classic explicit fix:

1. the large (skewed) side gets a uniform salt in ``[0, salt)`` per row —
   a deterministic hash of the row id when one is supplied (repeatable)
   or ``F.rand`` otherwise;
2. the smaller side is replicated ``salt`` times (explode of a literal
   sequence — bounded, ``salt x |right|`` rows);
3. the join key becomes (key, salt): the hot key's rows now spread over
   ``salt`` partitions.

Use when one side is far too large to broadcast AND key frequencies are
badly skewed; otherwise prefer ``F.broadcast`` or plain joins + AQE.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt: int = 16,
    how: str = "inner",
    large_id_col: Optional[str] = None,
) -> DataFrame:
    """Join ``large`` with ``small`` on equi-keys ``on``, spreading each
    key of ``large`` across ``salt`` shuffle partitions.

    ``how`` supports ``inner`` and ``left`` (left outer relative to
    ``large``). ``small`` is replicated ``salt`` times, so keep
    ``salt x |small|`` well under the large side's size.

    With ``large_id_col`` the salt is ``pmod(xxhash64(id), salt)`` —
    deterministic and repartition-independent; without it, ``F.rand`` is
    used (still correct: any salt value matches some replica).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if salt < 1:
        raise ValueError("salt must be >= 1")
    on = list(on)
    if large_id_col is not None:
        salt_expr = F.pmod(F.xxhash64(F.col(large_id_col)), F.lit(salt))
    else:
        salt_expr = (F.rand() * salt).cast("int")
    l_salted = large.withColumn("_salt", salt_expr.cast("int"))
    r_salted = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>"))
    )
    out = l_salted.join(r_salted, on=[*on, "_salt"], how=how)
    return out.drop("_salt")


def hot_key_report(
    df: DataFrame,
    key_col: str,
    *,
    top_k: int = 20,
) -> DataFrame:
    """Join/aggregation-key skew profile: the ``top_k`` hottest keys with
    their counts and share of all rows — the measurement that decides
    whether a key needs :func:`salted_join` / salting before it becomes
    the straggler task at scale (one bot-heavy user serializes a
    sessionization; one viral document serializes a posting list).

    ``(key, cnt, share, rank)``, hottest first; ties broken by key value
    so the report is deterministic. One map-side-combined aggregation +
    a top-k (TakeOrderedAndProject — per-partition heads, no full sort);
    ``share`` is a single integer division, engine-portable.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    counts = df.groupBy(F.col(key_col)).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    # limit-after-orderBy compiles to TakeOrderedAndProject: per-partition
    # heads of size top_k, no single-task global sort, no eager action.
    topk = counts.orderBy(F.col("cnt").desc(), F.col(key_col)).limit(top_k)
    total = counts.agg(F.sum("cnt").cast("double").alias("_total"))
    from pyspark.sql import Window

    # the window ranks only the <= top_k surviving rows — trivially bounded
    w = Window.orderBy(F.col("cnt").desc(), F.col(key_col))
    return (
        topk.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w))
        .select(
            key_col,
            "cnt",
            (F.col("cnt") / F.col("_total")).alias("share"),
            F.col("rank").cast("int").alias("rank"),
        )
        .orderBy("rank")
    )
