"""Stream-stream event-time joins (SURVEY.md §2.3 last row).

The reference cannot correlate two unbounded streams relationally (only
structurally via zip/combine_latest); Structured Streaming can, provided
both sides carry watermarks and the join condition bounds event time so
state is evictable. This module wraps that pattern.

Scale: state is kept per key until the watermark passes the time bound —
state size ~ (join-window duration × per-key rate), independent of stream
length. Keys shard across executors; RocksDB state store for large key
spaces (see plans/scale_notes.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    lookback: str,
    watermark: str,
    how: str = "inner",
) -> DataFrame:
    """Join right rows whose event time falls in
    ``[left_time - lookback, left_time]`` for the same key.

    Both sides get ``withWatermark(ts, watermark)`` (required for state
    eviction on a stream-stream join; harmless on batch frames, where the
    same expression is an ordinary range join).
    """
    l = left.withColumnRenamed(left_time, "__lt").alias("l")
    r = right.withColumnRenamed(right_time, "__rt").alias("r")
    if l.isStreaming:
        l = l.withWatermark("__lt", watermark)
    if r.isStreaming:
        r = r.withWatermark("__rt", watermark)
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col("r.__rt") >= F.col("l.__lt") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("r.__rt") <= F.col("l.__lt"))
    )
    return l.join(r, on=cond, how=how)
