"""Hypertable-style continuous aggregates: materialize a fine-grain
time rollup once, answer every coarser-grain query from the partials
(the TimescaleDB continuous-aggregate / druid-rollup pattern; reference
timed-window family, SURVEY.md §2.5).

Why this is a first-class 100 TB operator and not just two GROUP BYs:
at scale you do NOT re-scan raw events for each dashboard grain. You
keep an hourly (say) partial table that is **decomposable**: every
aggregate stored as its merge-able parts (count, sum, min, max — avg is
derived sum/count at read time, never stored). Then day/week/month
queries aggregate the partials — thousands of rows, not billions — and
any grain is exact, not approximate. The algebra is the same map-side
combine Spark does inside one job, lifted across jobs/tables.

``time_rollup`` produces the partials; ``rollup_merge`` re-aggregates
them to a coarser grain. Correctness contract: merge(rollup(fine)) ==
rollup(coarse) exactly — pinned cross-engine by q143's oracle (which
computes the coarse grain straight from raw events) and in-engine by a
property test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: stored partial columns; avg/stddev-style ratios are DERIVED, never stored
PARTIALS = ("cnt", "sum_v", "min_v", "max_v")


def time_rollup(
    df: DataFrame, ts_col: str, grain: str, keys: list[str], value_col: str
) -> DataFrame:
    """Fine-grain partial table: one row per (date_trunc(grain, ts),
    keys) carrying the decomposable partials of ``value_col``. One
    map-side-combined shuffle; at scale this is the table you persist
    (partitioned by the time bucket for pruning)."""
    return df.groupBy(
        F.date_trunc(grain, F.col(ts_col)).alias("bucket_ts"), *keys
    ).agg(
        F.count("*").alias("cnt"),
        F.sum(value_col).alias("sum_v"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def rollup_merge(partials: DataFrame, grain: str, keys: list[str]) -> DataFrame:
    """Coarser grain from the partials: sum the sums and counts, min the
    mins, max the maxes. Input is the rollup table (thousands of rows),
    so this is a near-free aggregation at any corpus size."""
    return partials.groupBy(
        F.date_trunc(grain, F.col("bucket_ts")).alias("bucket_ts"), *keys
    ).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def with_derived(df: DataFrame) -> DataFrame:
    """Read-time derived aggregates from the stored partials."""
    return df.withColumn("avg_v", F.col("sum_v") / F.col("cnt"))
