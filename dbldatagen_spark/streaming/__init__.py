"""Streaming generation support.

The engine's streaming story mirrors the reference (SURVEY §2.7): the
*seed source* swaps from ``spark.range`` to the Structured Streaming
``rate`` source (``DataGenerator.build(withStreaming=True, options=...)``),
every column expression applies unchanged (they are pure functions of the
seed column), and constraints that cannot hold per-micro-batch
(``UniqueCombinations``) are rejected at build.

Because all randomness is ``xxhash64(seed, value)`` over the rate source's
monotonically increasing ``value``, a streaming build emits *exactly the
same rows* as a batch build over the same id range — useful for replaying
a batch dataset as a stream.

This module adds small conveniences on top of the facade.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

from pyspark.sql import DataFrame

from dbldatagen_spark.datagen import DataGenerator
from dbldatagen_spark.sources.sinks import OutputDataset, write_data_to_output
from dbldatagen_spark.streaming.stateful import (
    global_dedup_with_state,
    session_window_agg,
    sessionize_with_state,
    transition_counts_with_state,
)
from dbldatagen_spark.streaming.windows import (
    dedup_within_watermark,
    windowed_event_counts,
)


def build_streaming(
    generator: DataGenerator,
    rows_per_second: int = 100,
    num_partitions: Optional[int] = None,
    **extra_options: Any,
) -> DataFrame:
    """Streaming build with the common rate-source options spelled out."""
    options: Dict[str, Any] = {"rowsPerSecond": rows_per_second}
    if num_partitions is not None:
        options["numPartitions"] = num_partitions
    options.update(extra_options)
    return generator.build(withStreaming=True, options=options)


def write_stream_once(
    df: DataFrame,
    path: str,
    checkpoint: str,
    output_format: str = "parquet",
    timeout_seconds: float = 60.0,
):
    """Trigger-available-now write: drain what the source already has, stop.

    Note: a ``rate`` source only *produces* rows after the query starts, so
    pair this with a source that has backlog, or use
    :func:`run_stream_until_rows` for rate-source tests.
    """
    query = write_data_to_output(
        df,
        OutputDataset(
            location=path,
            output_format=output_format,
            mode="append",
            trigger={"availableNow": True},
            checkpoint_location=checkpoint,
        ),
    )
    query.awaitTermination(timeout_seconds)
    return query


def run_stream_until_rows(
    df: DataFrame,
    path: str,
    checkpoint: str,
    output_format: str = "parquet",
    min_rows: int = 1,
    timeout_seconds: float = 60.0,
):
    """Run a streaming write until >= ``min_rows`` rows have been committed
    (by query progress accounting), then stop gracefully."""
    import time

    query = write_data_to_output(
        df,
        OutputDataset(
            location=path,
            output_format=output_format,
            mode="append",
            checkpoint_location=checkpoint,
        ),
    )
    deadline = time.monotonic() + timeout_seconds
    total = 0
    while time.monotonic() < deadline:
        total = sum(int(p["numInputRows"]) for p in query.recentProgress)
        if total >= min_rows:
            break
        time.sleep(0.5)
    query.stop()
    query.awaitTermination(timeout_seconds)
    return query
