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


def _tag_union(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str | Column,
    right_time: str | Column,
    value_cols: list[str],
    right_ord: str | None,
    direction: str,
) -> tuple[DataFrame, list[str]]:
    """Validate args and build the tagged union both as-of strategies
    start from: left rows side=1 carrying NULL values, right rows side=0
    carrying their value columns, unioned by name on (__k, __t, __side,
    __ord, values..., left columns...)."""
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
    return l.unionByName(r), left_cols


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
    u, left_cols = _tag_union(
        left, right, key, left_time, right_time, value_cols, right_ord, direction
    )
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


from pandas_streaming_spark.plans import plan_size_bytes as _plan_size_bytes

# combined left+right estimate below which the plain (key-partitioned)
# plan wins: the bucketed plan pays a fixed cell-aggregate + carry-seed
# overhead (~0.8 s at local[32]) that only amortizes once key-capped
# parallelism actually starves the cluster. Measured crossover on the
# bench shape (20 keys): plain 1.03 s vs bucketed 1.45 s at ~50 MB inputs,
# plain 18.9 s vs bucketed 4.6 s at ~500 MB — 128 MB splits the regimes.
_AUTO_THRESHOLD_BYTES = 128 * 1024 * 1024


def asof_join_auto(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str | Column,
    right_time: str | Column,
    value_cols: list[str],
    bucket_seconds: float,
    right_ord: str | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
    allow_exact_matches: bool = True,
    threshold_bytes: int | None = None,
) -> DataFrame:
    """Cost-gated as-of join (VERDICT r6 item 2): picks :func:`asof_join`
    (one key-partitioned window — lowest constant factor) below a
    size threshold and :func:`asof_join_bucketed` (parallelism =
    keys x time-buckets) above it, from Catalyst's free plan-statistics
    estimate of the two inputs — no counting job, no sampled scan.

    Unknown statistics (streaming relations, Python data sources) report
    ~Long.Max and therefore pick the bucketed plan — the safe direction:
    a few-hundred-ms constant overhead at worst, versus a key-cardinality
    parallelism cap on what might be 100 TB.

    ``threshold_bytes``: override the 128 MB default; the
    ``SPARK_GRAFT_ASOF_AUTO_THRESHOLD`` env var (bytes) overrides both —
    set it to 0 to force the bucketed plan, or huge to force plain
    (useful for pinning either regime in tests and plan audits).
    """
    import os

    env = os.environ.get("SPARK_GRAFT_ASOF_AUTO_THRESHOLD")
    if env is not None:
        try:
            threshold = int(env)
        except ValueError:
            raise ValueError(
                "SPARK_GRAFT_ASOF_AUTO_THRESHOLD must be a plain integer "
                f"byte count (got {env!r}); e.g. 134217728 for 128 MB, "
                "0 to force the bucketed plan"
            ) from None
    elif threshold_bytes is not None:
        threshold = threshold_bytes
    else:
        threshold = _AUTO_THRESHOLD_BYTES
    est = _plan_size_bytes(left) + _plan_size_bytes(right)
    if est < threshold:
        return asof_join(
            left, right, key, left_time, right_time, value_cols,
            right_ord=right_ord, direction=direction, tolerance=tolerance,
            allow_exact_matches=allow_exact_matches,
        )
    return asof_join_bucketed(
        left, right, key, left_time, right_time, value_cols,
        bucket_seconds=bucket_seconds, right_ord=right_ord,
        direction=direction, tolerance=tolerance,
        allow_exact_matches=allow_exact_matches,
    )


def _bucket_expr(u: DataFrame, bucket_seconds: float) -> Column:
    """Time-bucket id for the unioned __t column: floor(epoch / width).
    Handles timestamp (unix_micros), date (unix_date), and plain numeric
    time axes; the unit of ``bucket_seconds`` is seconds for temporal
    types and the column's own unit for numeric ones."""
    from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

    t_type = u.schema["__t"].dataType
    if isinstance(t_type, (TimestampType, TimestampNTZType)):
        width_us = int(round(bucket_seconds * 1_000_000))
        return F.floor(F.unix_micros(F.col("__t")) / F.lit(width_us))
    if isinstance(t_type, DateType):
        return F.floor(F.unix_date(F.col("__t")) * 86400 / F.lit(float(bucket_seconds)))
    return F.floor(F.col("__t") / F.lit(float(bucket_seconds)))


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str | Column,
    right_time: str | Column,
    value_cols: list[str],
    bucket_seconds: float,
    right_ord: str | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
    allow_exact_matches: bool = True,
) -> DataFrame:
    """Scale-hardened as-of join: identical semantics to :func:`asof_join`
    (full pd.merge_asof surface), but the window partitions on
    ``(key, time_bucket)`` instead of ``key`` alone, so parallelism scales
    with ``keys x buckets`` rather than being capped at the key
    cardinality (VERDICT r5 item 1 — a 20-value key at 100 TB is a
    straggler machine under the plain union+window plan).

    Two-level strategy, all DataFrame ops:

    1. **In-bucket pass** — the same running ``last/first`` window as the
       plain plan, but partitioned by ``(__k, __b)`` where
       ``__b = floor(epoch(__t) / bucket_seconds)``. Each left row sees
       the latest/earliest right row *within its own bucket*.
    2. **Carry fix-up** — one small aggregate per ``(key, bucket)`` cell
       computes the bucket's final (backward: max ``(t, ord)``; forward:
       min) right candidate; a per-key window over this *cell frame*
       (|keys|x|buckets| rows, broadcastable) yields each bucket's
       carry-in: the latest candidate from any strictly earlier bucket
       (backward) / earliest from any later bucket (forward). The cell
       frame is broadcast-joined back and ``coalesce(in_bucket, carry)``
       restores the exact global as-of answer: a right row in an earlier
       bucket always has strictly smaller time than anything in this
       bucket (bucket is a function of t), so the coalesce order IS time
       order, and strict/exact-match tie handling only ever applies
       within a bucket, where the window's side-ordering already resolves
       it.

    Cost: ONE exchange of the big union on ``(key, bucket)`` (same bytes
    as the plain plan's key exchange, just finer partitions), plus a
    map-side-combined aggregate to the tiny cell frame and its broadcast.
    Pick ``bucket_seconds`` so |keys| x |buckets| stays in broadcast
    range (millions of cells is fine) while each cell holds enough rows
    to amortize — for daily-grain data over years, one day is a good
    default. Correctness does not depend on the choice, only parallelism.
    """
    u, left_cols = _tag_union(
        left, right, key, left_time, right_time, value_cols, right_ord, direction
    )
    u = u.withColumn("__b", _bucket_expr(u, bucket_seconds))
    need_b = direction in ("backward", "nearest")
    need_f = direction in ("forward", "nearest")
    plain = tolerance is None and direction != "nearest"

    # right-candidate struct: match-time + tie-break ord + values. On the
    # PLAIN path (no tolerance, fixed direction) it exists only inside the
    # cells aggregate, not the main exchange: shipping a second copy of
    # (t, ord, values) through the big shuffle costs real bytes at scale,
    # and plain fills can run per-column. Per-column finals are filtered
    # to non-NULL values so cross-bucket carry has the same
    # skip-NULL-values semantics as the in-bucket
    # ``last(c, ignorenulls)`` (and as :func:`asof_join`'s plain path).
    def rs_struct(cols: list[str]) -> Column:
        return F.when(
            F.col("__side") == 0,
            F.struct(
                F.col("__t").alias("__mt"),
                F.col("__ord").alias("__mo"),
                *[F.col(c) for c in cols],
            ),
        )

    # cell frame: one row per (key, bucket) seen on EITHER side (left-only
    # buckets still need a carry-in to inherit), carrying the per-cell
    # backward/forward FINAL right candidate. Computed hash-friendly:
    # ``max(struct(...))``/``max_by(_, struct)`` force SortAggregate (a
    # full local sort of the input before partial agg — measured 2.5x the
    # cost of the hash path at 100x sf0.1), so the (t, ord) tie-break is
    # staged into two chained hash aggregates with primitive buffers:
    # level 1 collapses (k, b, t) cells to the max/min-__ord row via
    # ``max_by(col, long)``, level 2 collapses buckets via
    # ``max_by(col, t)`` — after level 1, t is unique per cell so a
    # single-field ordering is exact. Per-column max_by picks the same
    # row for every column (one ordering), preserving row consistency.
    rsrc = u.filter(F.col("__side") == 0)
    if plain:
        by1 = F.max_by if direction == "backward" else F.min_by
        agg1 = [
            by1(F.col(c), F.when(F.col(c).isNotNull(), F.col("__ord"))).alias(c)
            for c in value_cols
        ]
        l1 = rsrc.groupBy("__k", "__b", "__t").agg(*agg1)
        agg2 = [
            by1(F.col(c), F.when(F.col(c).isNotNull(), F.col("__t"))).alias(
                f"__f_{c}"
            )
            for c in value_cols
        ]
        finals = l1.groupBy("__k", "__b").agg(*agg2)
    else:
        u = u.withColumn("__rs", rs_struct(value_cols))
        agg1 = [F.max("__ord").alias("__mo")] + [
            F.max_by(F.col(c), F.col("__ord")).alias(c) for c in value_cols
        ]
        agg1f = [F.min("__ord").alias("__mo_f")] + [
            F.min_by(F.col(c), F.col("__ord")).alias(f"{c}__f")
            for c in value_cols
        ]
        l1 = rsrc.groupBy("__k", "__b", "__t").agg(
            *(agg1 if need_b else []), *(agg1f if need_f else [])
        )
        aggs = []
        if need_b:
            aggs += [
                F.max(F.col("__t")).alias("__bt"),
                F.max_by(F.col("__mo"), F.col("__t")).alias("__bo"),
            ] + [
                F.max_by(F.col(c), F.col("__t")).alias(f"__bv_{c}")
                for c in value_cols
            ]
        if need_f:
            aggs += [
                F.min(F.col("__t")).alias("__ft"),
                F.min_by(F.col("__mo_f"), F.col("__t")).alias("__fo"),
            ] + [
                F.min_by(F.col(f"{c}__f"), F.col("__t")).alias(f"__fv_{c}")
                for c in value_cols
            ]
        l2 = l1.groupBy("__k", "__b").agg(*aggs)
        # reassemble candidate structs matching rs_struct's type exactly
        sel = [F.col("__k"), F.col("__b")]
        if need_b:
            sel.append(
                F.struct(
                    F.col("__bt").alias("__mt"),
                    F.col("__bo").alias("__mo"),
                    *[F.col(f"__bv_{c}").alias(c) for c in value_cols],
                ).alias("__fb")
            )
        if need_f:
            sel.append(
                F.struct(
                    F.col("__ft").alias("__mt"),
                    F.col("__fo").alias("__mo"),
                    *[F.col(f"__fv_{c}").alias(c) for c in value_cols],
                ).alias("__ff")
            )
        finals = l2.select(*sel)
    presence = u.filter(F.col("__side") == 1).select("__k", "__b").distinct()
    cells = presence.join(finals, ["__k", "__b"], "full_outer")
    wcb = (
        Window.partitionBy("__k")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wcf = (
        Window.partitionBy("__k")
        .orderBy("__b")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    carry_cols = [F.col("__k"), F.col("__b")]
    if plain:
        wc = wcb if direction == "backward" else wcf
        carry_fn = F.last if direction == "backward" else F.first
        for c in value_cols:
            carry_cols.append(
                carry_fn(f"__f_{c}", ignorenulls=True).over(wc).alias(f"__c_{c}")
            )
    else:
        if need_b:
            carry_cols.append(F.last("__fb", ignorenulls=True).over(wcb).alias("__cb"))
        if need_f:
            carry_cols.append(F.first("__ff", ignorenulls=True).over(wcf).alias("__cf"))
    carry = cells.select(*carry_cols)

    # Carry delivery is a UNION, not a join: each (key, bucket) cell's
    # carry-in becomes one pseudo-right SEED ROW pinned to the bucket
    # start (backward, __sp=-1) or bucket end (forward, __sp=+1) by a
    # dedicated sort-position key, so the ONE big exchange+sort+window
    # both merges the carry and fills the left rows — no join touches the
    # big side at all. Seeds sort outside the real rows regardless of
    # tie/strictness handling (which only ever applies among real rows at
    # equal t within a bucket), and a seed from an earlier bucket always
    # has strictly smaller time than anything in this bucket, so
    # visibility is exact by construction.
    u = u.withColumn("__sp", F.lit(0))
    t_type = u.schema["__t"].dataType

    def seed_frame(sp: int, val_exprs: dict[str, Column]) -> DataFrame:
        cols = [
            F.col("__k"),
            F.col("__b"),
            F.lit(None).cast(t_type).alias("__t"),
            F.lit(-1).alias("__side"),
            F.lit(0).cast("long").alias("__ord"),
        ]
        for c in value_cols:
            cols.append(
                val_exprs[c].alias(c)
                if c in val_exprs
                else F.lit(None).cast(u.schema[c].dataType).alias(c)
            )
        for c in left_cols:
            cols.append(F.lit(None).cast(u.schema[c].dataType).alias(c))
        if not plain:
            cols.append(val_exprs["__rs"].alias("__rs"))
        cols.append(F.lit(sp).alias("__sp"))
        return carry.select(*cols)

    if plain:
        seeds = seed_frame(
            -1 if direction == "backward" else 1,
            {c: F.col(f"__c_{c}") for c in value_cols},
        )
    else:
        parts = []
        if need_b:
            parts.append(seed_frame(-1, {"__rs": F.col("__cb")}))
        if need_f:
            parts.append(seed_frame(1, {"__rs": F.col("__cf")}))
        seeds = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    m = u.unionByName(seeds)

    # in-bucket windows: same ordering contract as the plain plan
    # (side order encodes allow_exact_matches), finer partitioning, with
    # __sp as the primary sort key pinning seeds outside the real rows
    b_side = F.col("__side").asc() if allow_exact_matches else F.col("__side").desc()
    f_side = F.col("__side").desc() if allow_exact_matches else F.col("__side").asc()
    wb = (
        Window.partitionBy("__k", "__b")
        .orderBy(F.col("__sp").asc(), F.col("__t").asc(), b_side, F.col("__ord").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("__k", "__b")
        .orderBy(F.col("__sp").asc(), F.col("__t").asc(), f_side, F.col("__ord").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    t = F.col("__t").cast("double")

    if plain:
        if direction == "backward":
            fills = [
                F.last(c, ignorenulls=True).over(wb).alias(c) for c in value_cols
            ]
        else:
            fills = [
                F.first(c, ignorenulls=True).over(wf).alias(c) for c in value_cols
            ]
        filled = m.select(*left_cols, F.col("__side"), *fills)
        return filled.filter(F.col("__side") == 1).drop("__side")

    def gated(cand: Column) -> Column:
        # tolerance discards the chosen (nearest-in-direction) candidate,
        # it never falls back to a farther one — pd.merge_asof semantics
        if tolerance is None:
            return cand
        return F.when(
            F.abs(cand["__mt"].cast("double") - t) <= F.lit(float(tolerance)), cand
        )

    bw = gated(F.last("__rs", ignorenulls=True).over(wb)) if need_b else None
    fw = gated(F.first("__rs", ignorenulls=True).over(wf)) if need_f else None
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
    filled = m.select(*left_cols, F.col("__side"), *fills)
    return filled.filter(F.col("__side") == 1).drop("__side")
