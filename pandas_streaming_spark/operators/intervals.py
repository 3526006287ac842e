"""Interval overlap join: pairs of intervals with ``a.start <= b.end AND
b.start <= a.end`` (the reference's range-join family generalized from
point-in-interval to interval-vs-interval — calendar overlap, session vs
maintenance-window, ad-flight vs browsing-session joins).

Scale shape: the naive formulation is a theta join — Spark can only
execute an inequality-only condition as BroadcastNestedLoop/cartesian,
O(|A|·|B|). The scalable form is **temporal bucketization** (the same
trick range-join optimizers like Databricks' range join hint apply):
explode each interval to the fixed-width time buckets it spans, equi-join
on (keys…, bucket) — a plain hash join — then re-verify the exact
predicate and dedupe pairs that met in several buckets. Cost is
O(|A|·s_A + |B|·s_B + matches), s = avg buckets spanned; pick the bucket
width near the typical interval length so s stays small. Degenerate
inputs (an interval spanning the whole axis) make s explode — cap-aware
callers should split or broadcast those, same as any skew key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _spanned_buckets(start: str, end: str, bucket: str):
    return F.explode(
        F.sequence(
            F.date_trunc(bucket, F.col(start)),
            F.date_trunc(bucket, F.col(end)),
            F.expr(f"INTERVAL 1 {bucket}"),
        )
    )


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    on: list[str] | None = None,
    bucket: str = "hour",
) -> DataFrame:
    """Inner overlap join of two interval frames. ``on``: optional
    equality keys joined alongside the time bucket. Column names must be
    disjoint apart from ``on``. Closed-interval semantics:
    [a_start, a_end] ∩ [b_start, b_end] ≠ ∅. Bag semantics: duplicate
    input rows produce duplicate output pairs, exactly like the theta
    join this replaces.

    Two shuffles (the bucket hash join's two sides), no BNLJ/cartesian —
    plan-pinned in tests. A pair that overlaps meets in EVERY bucket
    both intervals span; instead of a distinct (which would also
    collapse genuine duplicate input rows), each pair is kept only in
    its canonical bucket — the later of the two start buckets, which
    both intervals necessarily span when they overlap.
    """
    on = on or []
    overlap_cols = (set(a.columns) & set(b.columns)) - set(on)
    if overlap_cols:
        raise ValueError(f"ambiguous columns {sorted(overlap_cols)}: rename first")
    # empty intervals (end < start) overlap nothing; dropping them here
    # also keeps F.sequence from throwing mid-task on a negative span
    a = a.where(F.col(a_start) <= F.col(a_end))
    b = b.where(F.col(b_start) <= F.col(b_end))
    ab = a.withColumn("__bkt", _spanned_buckets(a_start, a_end, bucket))
    bb = b.withColumn("__bkt", _spanned_buckets(b_start, b_end, bucket))
    canonical = F.greatest(
        F.date_trunc(bucket, F.col(a_start)), F.date_trunc(bucket, F.col(b_start))
    )
    joined = ab.join(bb, [*on, "__bkt"]).where(
        (F.col(a_start) <= F.col(b_end))
        & (F.col(b_start) <= F.col(a_end))
        & (F.col("__bkt") == canonical)
    )
    return joined.drop("__bkt")
