"""Adaptive parallelism guard for compute-heavy per-row operators.

Small parquet inputs (one file under ``spark.sql.files.maxPartitionBytes``)
arrive as a single partition, serializing expression-heavy work (minhash
signatures, quality scoring, embedding math) onto one core. At target
scale the same tables arrive with thousands of partitions, where a blind
``repartition`` would be a catastrophic full-text shuffle. This guard
widens only when the scan is narrower than the cluster: a no-op exactly
when the shuffle would be expensive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition iff the plan currently yields fewer
    partitions than the cluster's default parallelism (or
    ``min_partitions``).

    Under Spark Connect neither ``sparkContext`` nor ``df.rdd`` exists;
    the guard then degrades to a no-op (Connect clusters run server-side
    AQE, which already widens small scans)."""
    try:
        sc = df.sparkSession.sparkContext
        target = int(min_partitions or sc.defaultParallelism)
        current = df.rdd.getNumPartitions()
    except Exception:
        return df
    if current < target:
        return df.repartition(target)
    return df
