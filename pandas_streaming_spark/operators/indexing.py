"""Distributed global row indexing (round 7) — the scale-safe form of
``zipWithIndex`` / pandas ``reset_index`` over a defined ordering.

The naive Spark forms are both wrong at scale: ``row_number() OVER
(ORDER BY ...)`` with no partition key sends EVERY row through one
window partition (a single-task global sort), and
``monotonically_increasing_id`` is partition-layout-dependent (not a
rank, not stable across repartitioning). The classic two-phase
construction here is how distributed engines actually assign global
ranks:

1. range-partition on the order columns (sampled boundaries — any
   boundary placement yields the same final index as long as the
   ordering is total, so the sampling's nondeterminism never leaks);
2. per-partition ``row_number`` (parallel, memory = one partition);
3. per-partition row counts (tiny frame: one row per partition) prefix-
   summed into offsets and broadcast-joined back:
   ``global_index = offset[pid] + local_rank - 1``.

Requires the order columns to form a TOTAL order (no duplicate
composites) — equal keys straddling a range boundary would otherwise
make their relative ranks boundary-dependent. Callers append a unique
tiebreak column; the function enforces nothing it can't see.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class GlobalIndex(NamedTuple):
    """Result of :func:`global_index`: the indexed frame plus an explicit
    ``release()`` that unpersists the internal boundary pin.

    The pin is REQUIRED for correctness while ``df`` (or anything derived
    from it) is still being evaluated — repartitionByRange re-samples its
    boundaries per execution, so an unpinned plan's two subtrees (counts
    and output) can see different partitionings. Call ``release()`` only
    after the indexed result has been materialized (collected, written,
    or ``localCheckpoint(eager=True)``-ed). The explicit tuple replaces a
    round-7 dynamic ``_gi_pinned`` attribute that any ``withColumn``/
    ``groupBy`` silently dropped, leaving the cache unreleasable."""

    df: DataFrame
    release: Callable[[], None]


def global_index(
    df: DataFrame,
    order_cols: list[str],
    index_col: str = "__idx",
    num_partitions: int | None = None,
) -> GlobalIndex:
    """Append ``index_col``: the 0-based global rank of each row under
    ``ORDER BY order_cols`` — without a single-partition sort.

    One range exchange of the data + one tiny (|partitions|-row)
    aggregate broadcast back; the per-partition window sorts locally.
    Returns :class:`GlobalIndex` — ``.df`` is the indexed frame,
    ``.release()`` unpersists the boundary pin once a downstream result
    is materialized.
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    p = df.repartitionByRange(num_partitions, *order_cols).withColumn(
        "__gi_pid", F.spark_partition_id()
    )
    # PIN one evaluation: repartitionByRange samples its boundaries per
    # execution, and this frame feeds two subtrees (the counts aggregate
    # and the indexed output). Unpinned, each subtree re-samples and the
    # offsets disagree with the window's partitions — observed as
    # duplicate/globally-shifted indexes at sf0.01 the moment partition
    # count exceeded one. RDD.zipWithIndex pins the same way (its count
    # job runs over the materialized partitioning); MEMORY_AND_DISK spills
    # rather than evicting, so the pin survives memory pressure.
    p = p.persist()
    counts = p.groupBy("__gi_pid").agg(F.count("*").alias("__gi_cnt"))
    w_off = (
        Window.orderBy("__gi_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__gi_pid",
        F.coalesce(F.sum("__gi_cnt").over(w_off), F.lit(0)).alias("__gi_off"),
    )
    w_local = Window.partitionBy("__gi_pid").orderBy(*order_cols)
    out = (
        p.join(F.broadcast(offsets), "__gi_pid")
        .withColumn(
            index_col,
            (F.row_number().over(w_local) - 1 + F.col("__gi_off")).cast("long"),
        )
        .drop("__gi_pid", "__gi_off")
    )
    def _release() -> None:
        p.unpersist()

    return GlobalIndex(out, _release)
