"""As-of (backward nearest-timestamp) join — SURVEY.md §2.3 custom op #1.

The reference idiom is ``pd.merge_asof`` inside user map-partitions code.
Spark has no single as-of primitive, so this implements the *union+window*
strategy, which is pure DataFrame ops (no Python boundary):

1. Tag right rows side=0 carrying their value columns, left rows side=1
   carrying NULL values; union by name.
2. One window pass per key ordered by (t, side, ord):
   ``last(value, ignorenulls=True)`` over UNBOUNDED PRECEDING..CURRENT ROW
   gives every left row the value of the latest right row with
   ``right.t <= left.t`` (side=0 sorts before side=1 at equal t, so ties
   are inclusive; among equal-t right rows the max-``ord`` one wins).
3. Keep side=1 rows.

Scale: one shuffle on the key + per-partition sort — the exact cost
profile of a sort-merge join; state is bounded by the window frame being
a running ``last`` (constant memory per key in codegen). Skewed keys can
be salted upstream by bucketing the time dimension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_LEFT_ORD = 1 << 62  # left rows sort after any right row at equal (t, side)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str | Column,
    right_time: str | Column,
    value_cols: list[str],
    right_ord: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row's ``value_cols``
    with ``right_time <= left_time``, matching on ``key``.

    ``right_ord`` (e.g. an event id) breaks ties among right rows sharing
    one timestamp: the greatest wins — the same rule a sorted
    ``pd.merge_asof`` with a deduplicated-to-last right side applies.
    Returned columns: every left column + ``value_cols`` (NULL when no
    right row precedes).
    """
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"value_cols {sorted(clash)} already exist in the left frame; "
            "rename them on the right side before the as-of join"
        )
    lt = F.col(left_time) if isinstance(left_time, str) else left_time
    rt = F.col(right_time) if isinstance(right_time, str) else right_time

    left_cols = [c for c in left.columns]
    l = left.select(
        F.col(key).alias("__k"),
        lt.alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(_LEFT_ORD).alias("__ord"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols],
        *[F.col(c) for c in left_cols],
    )
    r = right.select(
        F.col(key).alias("__k"),
        rt.alias("__t"),
        F.lit(0).alias("__side"),
        (F.col(right_ord) if right_ord else F.lit(0)).cast("long").alias("__ord"),
        *[F.col(c) for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side", "__ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *left_cols,
        F.col("__side"),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    return filled.filter(F.col("__side") == 1).drop("__side")
