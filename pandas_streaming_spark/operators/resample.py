"""Time-series resampling (pandas ``resample``/``asfreq`` lineage,
beyond the SURVEY §2.5 window inventory): regularize an event stream
onto a fixed-interval spine and forward-fill gaps.

Scale shape — why the global window here is NOT the banned anti-pattern:
the fill runs on the AGGREGATED spine, whose cardinality is bound by the
time span over the interval (a century of hours is <1M rows), not by the
data volume; the data-sized work (the per-bucket aggregation) happens
first with map-side combine. Contrast with event-level global sorts,
which scale_notes.md bans. For multi-entity resampling, partition the
fill window by the entity key and the same bound holds per entity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    bounds_df: DataFrame,
    df: DataFrame,
    ts_col: str,
    agg_cols: dict[str, object],
    interval: str = "1 hour",
) -> DataFrame:
    """Aggregate ``df`` into ``interval`` buckets and re-index onto the
    full bucket spine of ``bounds_df``'s time range, forward-filling
    missing buckets (then zero-filling any leading buckets that precede
    the first observation).

    ``bounds_df`` supplies the spine range (usually the unfiltered
    table, so a filtered ``df`` keeps the calendar); ``agg_cols`` maps
    output name → aggregate expression over ``df``. Adds ``filled``
    (True where the bucket had no rows and carries copied/zero values).
    """
    trunc = lambda c: F.date_trunc("hour", c) if interval == "1 hour" else F.date_trunc(
        interval.split()[-1], c
    )
    spine = (
        bounds_df.agg(
            trunc(F.min(ts_col)).alias("__h0"), trunc(F.max(ts_col)).alias("__h1")
        )
        .select(
            F.explode(
                F.sequence("__h0", "__h1", F.expr(f"INTERVAL {interval}"))
            ).alias("bucket")
        )
    )
    hourly = df.groupBy(trunc(F.col(ts_col)).alias("bucket")).agg(
        *[expr.alias(name) for name, expr in agg_cols.items()]
    )
    joined = spine.join(hourly, "bucket", "left").withColumn(
        "filled", F.col(next(iter(agg_cols))).isNull()
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    for name in agg_cols:
        joined = joined.withColumn(
            name, F.last(F.col(name), ignorenulls=True).over(w)
        )
    return joined


def interpolate_linear(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    out_col: str = "interp_e4",
) -> DataFrame:
    """Per-key linear interpolation of NULL observations (pandas
    ``interpolate(method='time')``): a missing value between two
    observations gets ``prev + (next - prev) * (t - t_prev) /
    (t_next - t_prev)`` on the µs time axis; leading/trailing NULLs stay
    NULL (no extrapolation).

    Determinism: numerator terms are exact int64 (integer-unit values ×
    µs gaps), so the single IEEE division is performed on bit-identical
    operands in any engine; output is rounded e4 micro-units.

    Two window passes per direction (value and its timestamp), all on
    one hash-partition of the key — no self-joins, no data-sized global
    sort."""
    w_prev = (
        Window.partitionBy(key_col)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy(key_col)
        .orderBy(ts_col)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    t = F.unix_micros(F.col(ts_col))
    v = F.col(value_col)
    obs_t = F.when(v.isNotNull(), t)
    prev_v = F.last(v, ignorenulls=True).over(w_prev)
    prev_t = F.last(obs_t, ignorenulls=True).over(w_prev)
    next_v = F.first(v, ignorenulls=True).over(w_next)
    next_t = F.first(obs_t, ignorenulls=True).over(w_next)
    interp = F.when(v.isNotNull(), v.cast("double") * F.lit(1e4)).otherwise(
        F.when(
            prev_v.isNotNull() & next_v.isNotNull(),
            (
                prev_v.cast("double") * F.lit(1e4)
                + (next_v - prev_v).cast("double")
                * F.lit(1e4)
                * (t - prev_t).cast("double")
                / (next_t - prev_t).cast("double")
            ),
        )
    )
    return df.withColumn(out_col, F.round(interp, 0).cast("long"))
