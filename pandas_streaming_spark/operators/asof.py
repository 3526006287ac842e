"""As-of (nearest-timestamp) join, backward/forward/nearest —
SURVEY.md §2.3 custom op #1.

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
    direction: str = "backward",
    tolerance: float | None = None,
    allow_exact_matches: bool = True,
) -> DataFrame:
    """For each left row, attach one right row's ``value_cols`` matching
    on ``key`` — the full ``pd.merge_asof`` parameter surface:

    - ``direction='backward'``: latest right row with
      ``right_time <= left_time``;
    - ``'forward'``: earliest right row with ``right_time >= left_time``
      (symmetric window, frame flipped to CURRENT ROW..UNBOUNDED
      FOLLOWING with ``first(ignorenulls)``);
    - ``'nearest'``: whichever of the two candidates is closer in time,
      ties to the backward side — two frame passes over ONE shuffle
      (same partitioning, Spark inserts no second exchange);
    - ``tolerance`` (seconds, or plain units for numeric times): a
      candidate farther than this from ``left_time`` is discarded —
      the don't-join-stale-quotes guard;
    - ``allow_exact_matches=False``: the inequality becomes strict,
      implemented purely by flipping which side sorts first at equal
      timestamps (no extra pass).

    ``right_ord`` (e.g. an event id) breaks ties among right rows sharing
    one timestamp: the greatest wins for backward, the smallest for
    forward — the rules a sorted ``pd.merge_asof`` applies. Returned
    columns: every left column + ``value_cols`` (NULL when no candidate
    qualifies).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest: {direction}")
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
    # Equal-timestamp visibility is pure sort order: for an INCLUSIVE
    # backward match the right rows (side=0) sort before left at equal t
    # so the running last() sees them; STRICT flips the side order so
    # same-t rights fall outside the preceding frame. Forward mirrors it.
    b_side = F.col("__side").asc() if allow_exact_matches else F.col("__side").desc()
    f_side = F.col("__side").desc() if allow_exact_matches else F.col("__side").asc()
    wb = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), b_side, F.col("__ord").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), f_side, F.col("__ord").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    plain = tolerance is None and direction != "nearest"
    if plain and direction == "backward":
        fills = [F.last(c, ignorenulls=True).over(wb).alias(c) for c in value_cols]
    elif plain and direction == "forward":
        fills = [F.first(c, ignorenulls=True).over(wf).alias(c) for c in value_cols]
    else:
        # fill (match_time, values) structs so tolerance/nearest can
        # reason about the matched timestamp
        rs = F.when(
            F.col("__side") == 0,
            F.struct(F.col("__t").alias("__mt"), *[F.col(c) for c in value_cols]),
        )
        u = u.withColumn("__rs", rs)
        t = F.col("__t").cast("double")

        def gated(cand: Column) -> Column:
            if tolerance is None:
                return cand
            return F.when(
                F.abs(cand["__mt"].cast("double") - t) <= F.lit(float(tolerance)),
                cand,
            )

        bw = gated(F.last("__rs", ignorenulls=True).over(wb))
        fw = gated(F.first("__rs", ignorenulls=True).over(wf))
        if direction == "backward":
            chosen = bw
        elif direction == "forward":
            chosen = fw
        else:
            dist_b = F.abs(t - bw["__mt"].cast("double"))
            dist_f = F.abs(fw["__mt"].cast("double") - t)
            chosen = (
                F.when(bw.isNull(), fw)
                .when(fw.isNull(), bw)
                .when(dist_b <= dist_f, bw)
                .otherwise(fw)
            )
        fills = [chosen[c].alias(c) for c in value_cols]
    filled = u.select(*left_cols, F.col("__side"), *fills)
    return filled.filter(F.col("__side") == 1).drop("__side")
