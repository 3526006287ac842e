"""Time-series & quantile queries split out of `analytic` (round 6,
VERDICT r5 item 8): percentile binning, grouped quantiles, the
approx-quantile audit, calendar resampling with forward-fill (global
and per-key), event-time RANGE rolling, time-weighted averages, and
linear interpolation.

Same house rules and oracle discipline as the parent module.
"""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pandas_streaming_spark.catalog import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def q112_percentile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-percentile binning WITHOUT a global sort
    (operators/quantiles.py): exact quartile boundaries in one
    aggregate pass, broadcast, narrow per-row bin assignment — the
    scale-safe form of ``ntile`` for "keep the middle N% by length"
    curation cuts. Quarter probabilities keep every boundary exact in
    binary, so Spark and duckdb agree bit-for-bit."""
    from pandas_streaming_spark.operators.quantiles import percentile_bins

    d = percentile_bins(
        _t(spark, sf_dir, "documents"), "n_chars", [0.25, 0.5, 0.75]
    )
    return (
        d.groupBy("bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("bin")
    )


def q116_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language exact interpolated quartiles of document length
    (operators/quantiles.py group_quantiles): ONE hash-agg shuffle on
    the group key, quantile summaries combined map-side — never a
    per-group sort or collect. Quarter probs → exact binary boundaries
    (same determinism argument as q112)."""
    from pandas_streaming_spark.operators.quantiles import group_quantiles

    docs = _t(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    q = group_quantiles(docs, "lang", "n_chars", [0.25, 0.5, 0.75])
    return (
        counts.join(q, "lang")
        .select("lang", "n_docs", "p25", "p50", "p75")
        .orderBy("lang")
    )


def q118_approx_quantile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx rank-error audit (operators/quantiles.py
    approx_quantile_audit) over two value domains: integer doc lengths
    and double order totals. The sketch VALUE is partition-order
    dependent (ungradable); the GK rank-error contract and the exact
    quantile are not — grading the guarantee keeps the approx path
    honest under every partitioning the sweep throws at it."""
    from pandas_streaming_spark.operators.quantiles import approx_quantile_audit

    docs = approx_quantile_audit(
        _t(spark, sf_dir, "documents"), "n_chars", 0.5, 1000
    ).select(F.lit("documents.n_chars").alias("col"), "n", "exact", "rank_err_ok")
    orders = approx_quantile_audit(
        _t(spark, sf_dir, "orders"), "o_totalprice", 0.5, 1000
    ).select(F.lit("orders.o_totalprice").alias("col"), "n", "exact", "rank_err_ok")
    return docs.unionByName(orders).orderBy("col")


def q123_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample of purchase revenue onto the FULL calendar spine
    with forward-fill across the 40+ purchase-free hours
    (operators/resample.py — pandas ``resample``/``asfreq`` lineage).
    The fill window runs over the aggregated spine (time-bound
    cardinality), never the raw events; per-hour values are rounded
    BEFORE filling so copied values are bit-identical across engines."""
    from pandas_streaming_spark.operators.resample import resample_ffill

    ev = _t(spark, sf_dir, "events")
    out = resample_ffill(
        ev,
        ev.filter(F.col("event_type") == "purchase"),
        "ts",
        {
            "n": F.count("*").cast("long"),
            "rev": F.round(F.sum("value"), 2),
        },
        "1 hour",
    )
    return (
        out.select(
            F.date_format("bucket", "yyyy-MM-dd HH:mm").alias("w_start"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
            F.coalesce(F.col("rev"), F.lit(0.0)).alias("rev"),
            "filled",
        )
        .orderBy("w_start")
    )


def q124_rolling_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frame — the reference's ``rolling('2h')``
    (SURVEY §2.5), distinct from q24's row-count frame: at every event,
    aggregates over all of the SAME USER's events in the trailing two
    hours of EVENT TIME, however many rows that is.
    ``rangeBetween`` needs a numeric order key, so the frame rides
    ``unix_micros(ts)`` with a -2h µs bound — exactly duckdb's
    ``RANGE BETWEEN INTERVAL 2 HOUR PRECEDING AND CURRENT ROW`` over the
    µs timestamps. Sums are integer cents (exact in any accumulation
    order — engines disagree on frame-sum order otherwise)."""
    e = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-2 * 3600 * 1_000_000, 0)
    )
    return (
        e.select(
            "user_id",
            "event_id",
            F.count(F.lit(1)).over(w).cast("long").alias("n_2h"),
            F.sum(cents).over(w).cast("long").alias("sum_cents_2h"),
        )
        .orderBy("user_id", "event_id")
    )


def q125_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average value (TWAP): each observation is
    weighted by how long it remained current (µs until the user's next
    event; the final observation carries no weight — the standard
    left-closed convention). All arithmetic is exact int64 —
    cents × µs-duration products summed (≤2^63 at any per-user span
    the fixture reaches; at corpus scale switch the product to
    decimal(38,0) — noted, not needed here) — then ONE division rounded
    to e4, so both engines divide bit-identical operands."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    dur = (F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")).cast("long")
    weighted = e.select(
        "user_id", cents.alias("cents"), dur.alias("dur_us")
    ).filter(F.col("dur_us").isNotNull())
    return (
        weighted.groupBy("user_id")
        .agg(
            F.sum(F.col("cents") * F.col("dur_us")).alias("num"),
            F.sum("dur_us").alias("den"),
        )
        .select(
            "user_id",
            F.round(F.lit(1e4) * F.col("num") / F.col("den"), 0)
            .cast("long")
            .alias("twap_e4_cents"),
        )
        .orderBy("user_id")
    )


def q126_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user linear (time-weighted) interpolation of missing
    observations (operators/resample.py interpolate_linear — pandas
    ``interpolate(method='time')``): every third event keeps its value,
    the rest are NULLed and reconstructed from the neighboring
    observations on the µs time axis. The oracle mirrors the EXACT
    expression tree (left-assoc products, one division) so IEEE
    evaluation is bit-identical; output in rounded e4 units."""
    from pandas_streaming_spark.operators.resample import interpolate_linear

    e = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_id") % 3 == 0, F.col("value")).alias("v"),
    )
    out = interpolate_linear(e, "user_id", "ts", "v", tiebreak_col="event_id")
    return out.select("user_id", "event_id", "interp_e4").orderBy(
        "user_id", "event_id"
    )


def q129_resample_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity resampling (resample_ffill ``key_col`` mode): every
    user gets their OWN hourly spine ([their first, their last] event
    hour), per-(user, hour) counts forward-fill across that user's
    quiet hours, and the fill window partitions by the user — the
    per-device/per-user gap-fill shape. Because each spine starts at
    the key's first observation, no leading NULLs exist by
    construction."""
    from pandas_streaming_spark.operators.resample import resample_ffill

    ev = _t(spark, sf_dir, "events")
    out = resample_ffill(
        ev, ev, "ts", {"n": F.count("*").cast("long")}, "1 hour",
        key_col="user_id",
    )
    return (
        out.select(
            "user_id",
            F.date_format("bucket", "yyyy-MM-dd HH:mm").alias("w_start"),
            F.col("n").cast("long").alias("n"),
            "filled",
        )
        .orderBy("user_id", "w_start")
    )


def q159_asof_event_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The time-bucketed as-of join graded against duckdb's NATIVE
    ``ASOF JOIN`` — an independent engine's implementation of the same
    semantics, a strictly stronger oracle than the mirrored union+window
    SQL q11 uses. For each click event: the same user's latest purchase
    at-or-before it (backward, 1-hour tolerance) and earliest purchase
    at-or-after it (forward), both through
    ``operators/asof.asof_join_bucketed`` (6-hour buckets: ~120 buckets
    x ~1.5k users of parallelism — the 100 TB plan shape). The purchase
    side is pre-collapsed to unique (user, ts) via ``max_by(event_id)``
    so tie-breaks are engine-independent, and fills are graded in
    integer cents so cross-engine float-sum order cannot flip a digit.
    """
    from pandas_streaming_spark.operators.asof import asof_join_bucketed

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    pur = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("pts"))
        .agg(
            F.round(F.max_by("value", "event_id") * 100, 0)
            .cast("long")
            .alias("pv_cents")
        )
    )
    bw = asof_join_bucketed(
        clicks, pur, key="user_id", left_time="ts", right_time="pts",
        value_cols=["pv_cents"], bucket_seconds=21600.0,
        direction="backward", tolerance=3600.0,
    )
    fw = asof_join_bucketed(
        clicks, pur.withColumnRenamed("pv_cents", "fv_cents"),
        key="user_id", left_time="ts", right_time="pts",
        value_cols=["fv_cents"], bucket_seconds=21600.0,
        direction="forward",
    )
    agg_b = bw.groupBy("user_id").agg(
        F.count("*").alias("n_clicks"),
        F.count("pv_cents").alias("n_bw"),
        F.coalesce(F.sum("pv_cents"), F.lit(0)).cast("long").alias("sum_bw_cents"),
    )
    agg_f = fw.groupBy("user_id").agg(
        F.count("fv_cents").alias("n_fw"),
        F.coalesce(F.sum("fv_cents"), F.lit(0)).cast("long").alias("sum_fw_cents"),
    )
    return agg_b.join(agg_f, "user_id").orderBy("user_id")


def q188_time_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted (time-decayed) engagement aggregation — the
    batch twin of the streaming EWM (q72), keyed to the corpus horizon:
    each event contributes ``value / (1 + age_days)`` where age is whole
    days behind the table's max timestamp (1-row broadcast scalar). The
    harmonic kernel is chosen deliberately over exp(): every term is a
    RATIONAL of an IEEE double by a small integer — both engines compute
    the identical double, so the per-row e6 rounding (then exact long
    sums, any accumulation order) carries no transcendental-ulp risk at
    all, unlike ln/exp scoring (cf. q181's separation audit). Scale: one
    narrow map + one aggregate; the horizon is a broadcast scalar, not a
    window over the fact table."""
    ev = _t(spark, sf_dir, "events")
    horizon = ev.agg(F.max(F.to_date("ts")).alias("__h"))
    scored = ev.join(F.broadcast(horizon)).select(
        "event_type",
        F.round(
            F.lit(1e6)
            * F.col("value")
            / (F.lit(1) + F.datediff(F.col("__h"), F.to_date("ts"))),
            0,
        )
        .cast("long")
        .alias("__d_e6"),
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("__d_e6").cast("long").alias("sum_decayed_e6"),
        )
        .orderBy("event_type")
    )


def q192_pit_scd2_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (SCD2) dimension lookup — the warehouse twin of the
    event as-of join (q11/q159): every order is joined to the customer
    tier that was VALID AT ``o_orderdate``, against a two-epoch slowly-
    changing dimension (per customer: an initial tier from 1995-01-01
    and a deterministic re-tier at ``1996-01-01 + (c_custkey % 1500)
    days``). The engine runs the honest general mechanism — a backward
    inclusive as-of join on ``valid_from`` through
    ``operators/asof.asof_join_auto`` (cost-gated plain vs time-bucketed
    plan, 180-day buckets at scale) — while the oracle re-derives the
    tier from the closed-form epoch rule, so an off-by-one at a validity
    boundary (an order ON the re-tier date belongs to the NEW tier:
    exact matches advance) mismatches. Graded per tier: orders, distinct
    customers, exact cents. Scale: the dim is 2 rows/key but the as-of
    plan never assumes that; parallelism = keys x time-buckets."""
    from pandas_streaming_spark.operators.asof import asof_join_auto

    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    dim = c.select(
        F.col("c_custkey"),
        F.to_timestamp(F.lit("1995-01-01")).alias("valid_from"),
        F.concat(F.lit("t"), (F.col("c_custkey") % 3).cast("string")).alias(
            "tier"
        ),
    ).unionByName(
        c.select(
            F.col("c_custkey"),
            F.timestamp_seconds(
                F.unix_timestamp(F.to_timestamp(F.lit("1996-01-01")))
                + (F.col("c_custkey") % 1500) * 86400
            ).alias("valid_from"),
            F.concat(
                F.lit("t"), ((F.col("c_custkey") + 1) % 3).cast("string")
            ).alias("tier"),
        )
    )
    j = asof_join_auto(
        o.withColumnRenamed("o_custkey", "c_custkey"),
        dim,
        key="c_custkey",
        left_time="o_orderdate",
        right_time="valid_from",
        value_cols=["tier"],
        bucket_seconds=180 * 86400.0,
        direction="backward",
        allow_exact_matches=True,
    )
    return (
        j.groupBy("tier")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.countDistinct("c_custkey").cast("long").alias("n_customers"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .orderBy("tier")
    )


def q199_clamped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Saturating (two-sided clamped) running balance — the canonical
    NON-ASSOCIATIVE scan (``bal_i = min(cap, max(0, bal_{i-1} + d_i))``)
    that no window frame can express, via
    :func:`operators.stateful.clamped_running_balance` (one key shuffle
    + Arrow-batched per-key ordered scan; see the operator docstring for
    the saturating-add-monoid 100-TB escape hatch). Per user: purchases
    credit ``+ROUND(value*100)`` cents, clicks debit the same, clamp to
    [0, 10000]; graded per user as final balance + floor/cap hit counts
    — any drift anywhere in the scan order corrupts every later row, so
    the grade covers the whole trajectory. The oracle is the
    DEFINITIONAL recursive CTE (one step per rank) — what's graded is
    the scan semantics, engine-independent. Order is total (ts,
    event_id), deltas exact integers — a float delta would accumulate
    representation error over the scan."""
    from pandas_streaming_spark.operators.stateful import (
        clamped_running_balance,
    )

    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select(
            "user_id",
            "ts",
            "event_id",
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            )
            .otherwise(-F.round(F.col("value") * 100).cast("long"))
            .alias("delta"),
        )
    )
    walk = clamped_running_balance(
        ev, "user_id", ["ts", "event_id"], "delta", floor=0, cap=10_000
    )
    return (
        walk.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_steps"),
            F.max_by("bal", F.struct("ts", "event_id")).alias("final_cents"),
            F.sum(F.when(F.col("clipped") == -1, 1).otherwise(0))
            .cast("long")
            .alias("n_floor"),
            F.sum(F.when(F.col("clipped") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_cap"),
        )
        .orderBy("user_id")
    )


def q201_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing-7-day distinct active users per day. Distinct is
    NOT mergeable from per-day partials, so the exact linear-cost plan
    is the window EXPLODE: each distinct (user, day) activity row serves
    the 7 window-end days it falls into — a constant 7x row expansion
    into one map-side-combinable aggregate, instead of a 7-way per-day
    self-join (7 shuffles) or a quadratic day x history rescan. Days
    past the corpus max are dropped via a 1-row broadcast bound. At
    100 TB the exactness requirement is usually relaxed and this becomes
    per-day HLL sketches merged over the trailing window (the
    q141/q155/q156 family) — this entry grades the exact baseline those
    sketches are audited against."""
    ev = _t(spark, sf_dir, "events")
    ud = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    mx = ev.agg(F.max(F.to_date("ts")).alias("__mx"))
    return (
        ud.select(
            "user_id",
            F.explode(
                F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
            ).alias("day"),
        )
        .join(F.broadcast(mx))
        .filter(F.col("day") <= F.col("__mx"))
        .groupBy(F.col("day").cast("timestamp").alias("day"))
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
        .orderBy("day")
    )


def q204_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch revenue attribution: each purchase's cents are
    credited to the channel (event_type) of the user's most recent
    preceding non-purchase event within 1 h, else 'direct'. ONE window
    per user — ``last(non-purchase, ignoreNulls)`` over rows
    ``(unboundedPreceding, -1)`` in total (ts, event_id) order — where
    the naive spec is a per-purchase correlated lookback (a self-join
    that explodes on active users). The 1 h recency gate compares epoch
    MICROSECONDS as integers (q195's boundary rule: a seconds-double
    comparison rounds; an event exactly 1 h before still attributes).
    Scale: one key-partitioned window + one tiny channel aggregate —
    the window state is a single struct, and parallelism is user
    cardinality."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.last(
        F.when(
            F.col("event_type") != "purchase",
            F.struct(F.col("ts").alias("pts"), F.col("event_type").alias("pt")),
        ),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("__prev", prev)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.when(
                F.col("__prev").isNotNull()
                & (
                    F.unix_micros(F.col("ts"))
                    - F.unix_micros(F.col("__prev.pts"))
                    <= 3_600_000_000
                ),
                F.col("__prev.pt"),
            )
            .otherwise(F.lit("direct"))
            .alias("channel"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("channel")
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .orderBy("channel")
    )


def q244_position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) MULTI-touch attribution — the
    complement to q204's last-touch: each purchase's credit splits 40%
    to the first touch, 40% to the last, and 20% equally across the
    middles (1 touch → 100%, 2 touches → 50/50, none → 'direct'), over
    the same 1-hour lookback with the same inclusive-microsecond
    boundary. Per-touch credit is an integer in MILLI-CENTS:
    40%/50%/100% weights are exact integer products; a middle touch
    gets ``round(200·cents / m)`` — a deterministic double both engines
    round identically — so per-channel totals are exact integer sums
    (order-free). Plan: ONE per-user range-frame window collects each
    purchase's path (collect_list over rangeBetween(-1h, -1), state
    bounded by events/user/hour — the q124 rolling-range shape, NOT a
    per-purchase self-join), the path array is sorted for deterministic
    first/middle/last, and the credit rows are built with array
    expressions and exploded. Graded per channel: touch count and total
    credit."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("uts"),
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("uts")
        .rangeBetween(-3_600_000_000, -1)
    )
    path = F.array_sort(
        F.collect_list(
            F.when(
                F.col("event_type") != "purchase",
                F.struct(
                    F.col("uts").alias("puts"),
                    F.col("event_id").alias("pid"),
                    F.col("event_type").alias("ch"),
                ),
            )
        ).over(w)
    )
    pur = (
        base.withColumn("__path", path)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            "__path",
        )
    )
    n = F.size("__path")
    ends_w = F.when(n == 2, F.lit(500)).otherwise(F.lit(400))
    entry = lambda ch, mc: F.struct(  # noqa: E731
        ch.alias("ch"), mc.cast("long").alias("mc")
    )
    credits = (
        F.when(
            n == 0,
            F.array(entry(F.lit("direct"), 1000 * F.col("cents"))),
        )
        .when(
            n == 1,
            F.array(
                entry(F.element_at("__path", 1)["ch"], 1000 * F.col("cents"))
            ),
        )
        .otherwise(
            F.concat(
                F.array(
                    entry(
                        F.element_at("__path", 1)["ch"],
                        ends_w * F.col("cents"),
                    )
                ),
                F.transform(
                    F.slice(F.col("__path"), 2, F.greatest(n - 2, F.lit(0))),
                    lambda x: entry(
                        x["ch"],
                        F.round(
                            F.lit(200.0) * F.col("cents") / (n - 2), 0
                        ),
                    ),
                ),
                F.array(
                    entry(
                        F.element_at("__path", -1)["ch"],
                        ends_w * F.col("cents"),
                    )
                ),
            )
        )
    )
    return (
        pur.select(F.explode(credits).alias("c"))
        .groupBy(F.col("c.ch").alias("channel"))
        .agg(
            F.count("*").cast("long").alias("n_touches"),
            F.sum("c.mc").cast("long").alias("credit_mc"),
        )
        .orderBy("channel")
    )


def q245_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal index — the de-seasonalization baseline
    (mean revenue on an ISO weekday vs the all-days mean, in basis
    points): index = 1e4 · (sum_dow / days_dow) / (sum_all / days_all)
    computed as the EXACT integer cross-product ratio
    ``sum_dow·days_all / (days_dow·sum_all)`` rounded once (no
    intermediate float means; overflow headroom: cents·days products
    stay under int64 to ~1e15 total cents — wider ranges drop cents to
    e0 units first). Graded per ISO weekday (1=Mon..7=Sun): order
    count, active days, exact cents, index_bp. Scale: one map-side-
    combined date aggregate, then a 7-row frame against a 1-row
    broadcast total."""
    o = _t(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    daily = o.groupBy("d").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").alias("cents"),
    )
    dow = daily.groupBy((F.weekday("d") + 1).cast("long").alias("dow_iso")).agg(
        F.sum("n").cast("long").alias("n_orders"),
        F.count("*").cast("long").alias("n_days"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )
    tot = dow.agg(
        F.sum("n_days").cast("long").alias("__days_all"),
        F.sum("sum_cents").cast("long").alias("__cents_all"),
    )
    return (
        dow.join(F.broadcast(tot))
        .select(
            "dow_iso",
            "n_orders",
            "n_days",
            "sum_cents",
            F.round(
                F.lit(1e4)
                * (F.col("sum_cents") * F.col("__days_all"))
                / (F.col("n_days") * F.col("__cents_all")),
                0,
            )
            .cast("long")
            .alias("index_bp"),
        )
        .orderBy("dow_iso")
    )


def q219_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detection per user (Page 1954's sequential
    change-point statistic, the standard production-monitoring form):
    ``s_i = max(0, s_{i-1} + (x_i - slack))`` over purchase cents with
    slack=5000; an alarm row is any step with s >= 20000. The recurrence
    is the clamped scan with floor=0 and an unreachable cap, so it
    REUSES :func:`operators.stateful.clamped_running_balance` unchanged
    (deltas bounded by 10^4 cents x 10^4 rows per user << 2^62) — the
    generality the non-associative scan operator was built for. Graded
    per user: steps, final statistic, max statistic, alarm-step count,
    floor-reset count; any scan-order drift corrupts every later value.
    Oracle: the definitional recursive CTE."""
    from pandas_streaming_spark.operators.stateful import (
        clamped_running_balance,
    )

    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "ts",
            "event_id",
            (F.round(F.col("value") * 100).cast("long") - F.lit(5000)).alias(
                "delta"
            ),
        )
    )
    walk = clamped_running_balance(
        ev, "user_id", ["ts", "event_id"], "delta", floor=0, cap=1 << 60
    )
    return (
        walk.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_steps"),
            F.max_by("bal", F.struct("ts", "event_id")).alias("final_stat"),
            F.max("bal").cast("long").alias("max_stat"),
            F.sum(F.when(F.col("bal") >= 20_000, 1).otherwise(0))
            .cast("long")
            .alias("n_alarms"),
            F.sum(F.when(F.col("clipped") == -1, 1).otherwise(0))
            .cast("long")
            .alias("n_resets"),
        )
        .orderBy("user_id")
    )


def q226_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median over a trailing 5-row frame per user — the robust
    smoother Spark has NO native window form for (median/percentile
    reject ORDER BY frames): built exactly from
    ``array_sort(collect_list(cents))`` over the frame + element_at
    midpoints, graded as 2x the interpolated median so the value stays
    an exact integer (lower+upper cent, no .5 float). duckdb's native
    windowed MEDIAN (x2) is the independent oracle. Scale: frame state
    is K=5 values per row by construction — collect_list over a
    BOUNDED row frame is O(K) per row, the same cost class as any
    rolling aggregate; an unbounded frame would be the anti-pattern."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    cents = F.round(F.col("value") * 100).cast("long")
    sorted_f = F.array_sort(F.collect_list(cents).over(w))
    return (
        ev.select(
            "user_id",
            "event_id",
            cents.alias("cents"),
            sorted_f.alias("__s"),
        )
        .withColumn("__n", F.size("__s"))
        .select(
            "user_id",
            "event_id",
            "cents",
            F.col("__n").cast("long").alias("n_frame"),
            (
                F.element_at("__s", ((F.col("__n") + 1) / 2).cast("int"))
                + F.element_at("__s", (F.col("__n") / 2 + 1).cast("int"))
            )
            .cast("long")
            .alias("med2_cents"),
        )
        .orderBy("user_id", "event_id")
    )


def q228_rolling_zscore_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly gate with ZERO floats in the predicate:
    a purchase is flagged when it sits more than 3 sample standard
    deviations from its user's trailing-20 mean (frame EXCLUDES the
    current row — self-inclusion shrinks the deviation). The 3-sigma
    test is cross-multiplied into exact int64 terms:
    ``(n·x − S)²·(n−1) > 9·(n·Q − S²)`` with S=Σcents, Q=Σcents² over
    the frame — overflow-audited: cents ≤ 1e4, frame ≤ 20 keeps every
    term < 2^52. Graded per user as checked/flagged counts. Scale: one
    key window with two running sums — constant state per row."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    cents = F.round(F.col("value") * 100).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    d = ev.select(
        "user_id",
        cents.alias("x"),
        F.count(cents).over(w).cast("long").alias("n"),
        F.sum(cents).over(w).cast("long").alias("s"),
        F.sum(cents * cents).over(w).cast("long").alias("q"),
    ).filter(F.col("n") >= 8)
    lhs = (
        (F.col("n") * F.col("x") - F.col("s"))
        * (F.col("n") * F.col("x") - F.col("s"))
        * (F.col("n") - 1)
    )
    rhs = 9 * F.col("n") * (F.col("n") * F.col("q") - F.col("s") * F.col("s"))
    return (
        d.select(
            "user_id", F.when(lhs > rhs, 1).otherwise(0).alias("__f")
        )
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_checked"),
            F.sum("__f").cast("long").alias("n_flagged"),
        )
        .orderBy("user_id")
    )


def q271_out_of_order_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order-depth audit — the measurement that SETS a streaming
    watermark (q43–q48 all assert one; this query is how you choose it):
    within each user's INGEST order (event_id is the arrival sequence),
    an event is late if its event time precedes the running max event
    time already ingested for that user; its lateness is the µs gap to
    that frontier. Graded per event_type: events, late events, late
    share in bp, and the max lateness in whole minutes — the watermark
    delay that would have admitted everything. Scale: one
    user-partitioned running-max window (rows between unbounded
    preceding and 1 preceding) + one map-side-combined rollup; no
    global sort."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("__us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lateness = ev.withColumn(
        "__frontier", F.max("__us").over(w)
    ).withColumn(
        "__late_us",
        F.when(
            F.col("__frontier") > F.col("__us"),
            F.col("__frontier") - F.col("__us"),
        ).otherwise(F.lit(0)),
    )
    return (
        lateness.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.when(F.col("__late_us") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_late"),
            F.floor(F.max("__late_us") / 60_000_000)
            .cast("long")
            .alias("max_late_min"),
        )
        .select(
            "event_type",
            "n_events",
            "n_late",
            F.round(F.lit(1e4) * F.col("n_late") / F.col("n_events"), 0)
            .cast("long")
            .alias("late_bp"),
            "max_late_min",
        )
        .orderBy("event_type")
    )


QUERIES = {
    "q271_out_of_order_audit": q271_out_of_order_audit,
    "q244_position_attribution": q244_position_attribution,
    "q245_seasonal_index": q245_seasonal_index,
    "q192_pit_scd2_join": q192_pit_scd2_join,
    "q219_cusum_drift": q219_cusum_drift,
    "q226_rolling_median": q226_rolling_median,
    "q228_rolling_zscore_gate": q228_rolling_zscore_gate,
    "q199_clamped_balance": q199_clamped_balance,
    "q201_rolling_distinct": q201_rolling_distinct,
    "q204_attribution_last_touch": q204_attribution_last_touch,
    "q188_time_decay_score": q188_time_decay_score,
    "q159_asof_event_join": q159_asof_event_join,
    "q112_percentile_bins": q112_percentile_bins,
    "q116_group_quantiles": q116_group_quantiles,
    "q118_approx_quantile_audit": q118_approx_quantile_audit,
    "q123_resample_ffill": q123_resample_ffill,
    "q124_rolling_time_range": q124_rolling_time_range,
    "q125_time_weighted_avg": q125_time_weighted_avg,
    "q126_interpolate": q126_interpolate,
    "q129_resample_per_key": q129_resample_per_key,
}

ORACLES = {
    # same ingest-order frontier (event_id), µs lateness, minute floor
    "q271_out_of_order_audit": """
WITH e AS (
  SELECT user_id, event_id, event_type, EPOCH_US(ts) AS us FROM events
),
f AS (
  SELECT *, MAX(us) OVER (PARTITION BY user_id ORDER BY event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS frontier
  FROM e
),
l AS (
  SELECT event_type,
         CASE WHEN frontier > us THEN frontier - us ELSE 0 END AS late_us
  FROM f
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(ROUND(1e4 * SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END)
                  / COUNT(*), 0) AS BIGINT) AS late_bp,
       CAST(FLOOR(MAX(late_us) / 60000000.0) AS BIGINT) AS max_late_min
FROM l GROUP BY event_type ORDER BY event_type
""",
    # same 1h inclusive lookback, sorted path ranks, 1000/500/400 exact
    # integer weights + round(200*cents/m) middles, direct fallback
    "q244_position_attribution": """
WITH e AS (
  SELECT event_id, user_id, event_type, EPOCH_US(ts) AS uts, value
  FROM events
),
p AS (
  SELECT event_id AS pid, user_id, uts,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM e WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, event_id, event_type AS ch, uts
  FROM e WHERE event_type <> 'purchase'
),
paths AS (
  SELECT p.pid, p.cents, t.ch,
         ROW_NUMBER() OVER (PARTITION BY p.pid
                            ORDER BY t.uts, t.event_id) AS r,
         COUNT(*) OVER (PARTITION BY p.pid) AS n
  FROM p JOIN t ON t.user_id = p.user_id
   AND t.uts < p.uts AND t.uts >= p.uts - 3600000000
),
credits AS (
  SELECT ch,
         CASE WHEN n = 1 THEN 1000 * cents
              WHEN r = 1 OR r = n
                THEN (CASE WHEN n = 2 THEN 500 ELSE 400 END) * cents
              ELSE CAST(ROUND(200.0 * cents / (n - 2), 0) AS BIGINT)
         END AS mc
  FROM paths
  UNION ALL
  SELECT 'direct' AS ch, 1000 * cents AS mc
  FROM p WHERE NOT EXISTS (
    SELECT 1 FROM t WHERE t.user_id = p.user_id
     AND t.uts < p.uts AND t.uts >= p.uts - 3600000000)
)
SELECT ch AS channel, CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(SUM(mc) AS BIGINT) AS credit_mc
FROM credits GROUP BY ch ORDER BY channel
""",
    # same ISO weekday buckets; index as one rounded integer cross-ratio
    "q245_seasonal_index": """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
),
dow AS (
  SELECT CAST(ISODOW(d) AS BIGINT) AS dow_iso,
         CAST(SUM(n) AS BIGINT) AS n_orders,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(cents) AS BIGINT) AS sum_cents
  FROM daily GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n_days) AS BIGINT) AS days_all,
         CAST(SUM(sum_cents) AS BIGINT) AS cents_all
  FROM dow
)
SELECT dow_iso, n_orders, n_days, sum_cents,
       CAST(ROUND(1e4 * (sum_cents * days_all)
                  / (n_days * cents_all), 0) AS BIGINT) AS index_bp
FROM dow CROSS JOIN tot
ORDER BY dow_iso
""",
    # the definitional one-step-per-rank recursive walk; LEAST/GREATEST
    # on exact BIGINTs, so every step is engine-identical
    # duckdb's NATIVE windowed MEDIAN (x2 to stay integer) vs the
    # engine's sorted-frame construction — independent formulations
    "q226_rolling_median": """
SELECT user_id, event_id,
       CAST(ROUND(value * 100) AS BIGINT) AS cents,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_frame,
       CAST(2 * MEDIAN(CAST(ROUND(value * 100) AS BIGINT)) OVER w
            AS BIGINT) AS med2_cents
FROM events WHERE event_type = 'purchase'
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
""",
    # same cross-multiplied integer 3-sigma predicate
    "q228_rolling_zscore_gate": """
WITH d AS (
  SELECT user_id,
         CAST(ROUND(value * 100) AS BIGINT) AS x,
         CAST(COUNT(*) OVER w AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT) AS s,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)
                  * CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT)
           AS q
  FROM events WHERE event_type = 'purchase'
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_checked,
       CAST(SUM(CASE WHEN (n*x - s) * (n*x - s) * (n - 1)
                          > 9 * n * (n*q - s*s)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
FROM d WHERE n >= 8
GROUP BY user_id ORDER BY user_id
""",
    # definitional recursive CTE; cap unreachable so only the floor
    # clamp appears (GREATEST) — mirrors the engine's 1<<60 cap exactly
    "q219_cusum_drift": """
WITH RECURSIVE ev AS (
  SELECT user_id, ts, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn,
         CAST(ROUND(value * 100) AS BIGINT) - 5000 AS delta
  FROM events WHERE event_type = 'purchase'
), walk AS (
  SELECT user_id, rn, delta AS raw,
         GREATEST(0, delta) AS bal
  FROM ev WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.rn, w.bal + e.delta AS raw,
         GREATEST(0, w.bal + e.delta) AS bal
  FROM walk w JOIN ev e ON e.user_id = w.user_id AND e.rn = w.rn + 1
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_steps,
       CAST(MAX(CASE WHEN rn = mx THEN bal END) AS BIGINT) AS final_stat,
       CAST(MAX(bal) AS BIGINT) AS max_stat,
       CAST(SUM(CASE WHEN bal >= 20000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_alarms,
       CAST(SUM(CASE WHEN raw < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_resets
FROM (SELECT *, MAX(rn) OVER (PARTITION BY user_id) AS mx FROM walk)
GROUP BY user_id ORDER BY user_id
""",
    "q199_clamped_balance": """
WITH RECURSIVE ev AS (
  SELECT user_id, ts, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn,
         CASE WHEN event_type = 'purchase'
              THEN CAST(ROUND(value * 100) AS BIGINT)
              ELSE -CAST(ROUND(value * 100) AS BIGINT) END AS delta
  FROM events WHERE event_type IN ('purchase', 'click')
), walk AS (
  SELECT user_id, rn, delta AS raw,
         LEAST(10000, GREATEST(0, delta)) AS bal
  FROM ev WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.rn, w.bal + e.delta AS raw,
         LEAST(10000, GREATEST(0, w.bal + e.delta)) AS bal
  FROM walk w JOIN ev e ON e.user_id = w.user_id AND e.rn = w.rn + 1
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_steps,
       CAST(MAX(CASE WHEN rn = mx THEN bal END) AS BIGINT) AS final_cents,
       CAST(SUM(CASE WHEN raw < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_floor,
       CAST(SUM(CASE WHEN raw > 10000 THEN 1 ELSE 0 END) AS BIGINT) AS n_cap
FROM (SELECT *, MAX(rn) OVER (PARTITION BY user_id) AS mx FROM walk)
GROUP BY user_id ORDER BY user_id
""",
    # same 7x window-explode form; DATE + i arithmetic in both engines
    "q201_rolling_distinct": """
WITH ud AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
), mx AS (SELECT MAX(CAST(ts AS DATE)) AS m FROM events),
ex AS (
  SELECT ud.user_id, ud.d + CAST(s.i AS INTEGER) AS day
  FROM ud CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 6)) AS i) s
  CROSS JOIN mx
  WHERE ud.d + CAST(s.i AS INTEGER) <= mx.m
)
SELECT CAST(day AS TIMESTAMP) AS day,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM ex GROUP BY 1 ORDER BY 1
""",
    # same spec, duckdb's IGNORE-NULLS window; the two LAST_VALUE calls
    # share one filter so they read the same attributed row
    "q204_attribution_last_touch": """
WITH w AS (
  SELECT event_type, value, ts,
         LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN ts END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_ts,
         LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_type
  FROM events
)
SELECT CASE WHEN prev_ts IS NOT NULL
             AND epoch_us(ts) - epoch_us(prev_ts) <= 3600000000
            THEN prev_type ELSE 'direct' END AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM w WHERE event_type = 'purchase'
GROUP BY channel ORDER BY channel
""",
    # the oracle resolves the SCD2 epoch with the closed-form rule (an
    # order on/after the per-customer re-tier date takes the new tier),
    # independent of the engine's as-of mechanism
    "q192_pit_scd2_join": """
WITH o AS (
  SELECT o_custkey AS c_custkey, o_orderdate,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
t AS (
  SELECT c_custkey, o_orderdate, cents,
         CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
                   + INTERVAL ((c_custkey % 1500)) DAY
              THEN 't' || CAST((c_custkey + 1) % 3 AS VARCHAR)
              ELSE 't' || CAST(c_custkey % 3 AS VARCHAR)
         END AS tier
  FROM o
)
SELECT tier, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_customers,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM t GROUP BY tier ORDER BY tier
""",
    "q188_time_decay_score": """
WITH h AS (SELECT MAX(CAST(ts AS DATE)) AS hd FROM events),
s AS (
  SELECT event_type,
         CAST(ROUND(1e6 * value /
              (1 + DATEDIFF('day', CAST(ts AS DATE), hd)), 0) AS BIGINT)
           AS d_e6
  FROM events, h
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(d_e6) AS BIGINT) AS sum_decayed_e6
FROM s GROUP BY event_type ORDER BY event_type
""",
    "q159_asof_event_join": """
WITH c AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id, ts AS pts,
         CAST(ROUND(MAX_BY(value, event_id) * 100, 0) AS BIGINT) AS pv_cents
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, ts
),
bw AS (
  SELECT c.user_id, c.event_id,
         CASE WHEN c.ts - p.pts <= INTERVAL 3600 SECONDS
              THEN p.pv_cents END AS pv
  FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.pts
),
fw AS (
  SELECT c.user_id, c.event_id, p.pv_cents AS fv
  FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts <= p.pts
)
SELECT b.user_id,
       COUNT(*) AS n_clicks,
       COUNT(b.pv) AS n_bw,
       CAST(COALESCE(SUM(b.pv), 0) AS BIGINT) AS sum_bw_cents,
       COUNT(f.fv) AS n_fw,
       CAST(COALESCE(SUM(f.fv), 0) AS BIGINT) AS sum_fw_cents
FROM bw b JOIN fw f ON b.user_id = f.user_id AND b.event_id = f.event_id
GROUP BY b.user_id
ORDER BY b.user_id
""",
    "q112_percentile_bins": """
WITH b AS (
  SELECT QUANTILE_CONT(n_chars, 0.25) AS p25,
         QUANTILE_CONT(n_chars, 0.50) AS p50,
         QUANTILE_CONT(n_chars, 0.75) AS p75
  FROM documents
)
SELECT (CASE WHEN n_chars > p25 THEN 1 ELSE 0 END
      + CASE WHEN n_chars > p50 THEN 1 ELSE 0 END
      + CASE WHEN n_chars > p75 THEN 1 ELSE 0 END) AS bin,
       COUNT(*) AS n_docs,
       MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars
FROM documents, b
GROUP BY 1
ORDER BY bin
""",
    "q116_group_quantiles": """
SELECT lang, COUNT(*) AS n_docs,
       QUANTILE_CONT(n_chars, 0.25) AS p25,
       QUANTILE_CONT(n_chars, 0.50) AS p50,
       QUANTILE_CONT(n_chars, 0.75) AS p75
FROM documents
GROUP BY lang
ORDER BY lang
""",
    "q118_approx_quantile_audit": """
SELECT 'documents.n_chars' AS col, COUNT(*) AS n,
       QUANTILE_CONT(n_chars, 0.5) AS exact, TRUE AS rank_err_ok
FROM documents
UNION ALL
SELECT 'orders.o_totalprice' AS col, COUNT(*) AS n,
       QUANTILE_CONT(o_totalprice, 0.5) AS exact, TRUE AS rank_err_ok
FROM orders
ORDER BY col
""",
    "q123_resample_ffill": """
WITH bounds AS (
  SELECT DATE_TRUNC('hour', MIN(ts)) AS h0, DATE_TRUNC('hour', MAX(ts)) AS h1
  FROM events
),
spine AS (
  SELECT UNNEST(GENERATE_SERIES(h0, h1, INTERVAL 1 HOUR)) AS bucket FROM bounds
),
hourly AS (
  SELECT DATE_TRUNC('hour', ts) AS bucket, COUNT(*) AS n, ROUND(SUM(value), 2) AS rev
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
filledt AS (
  SELECT s.bucket,
         h.bucket IS NULL AS filled,
         LAST_VALUE(h.n IGNORE NULLS) OVER w AS n,
         LAST_VALUE(h.rev IGNORE NULLS) OVER w AS rev
  FROM spine s LEFT JOIN hourly h ON s.bucket = h.bucket
  WINDOW w AS (ORDER BY s.bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT STRFTIME(bucket, '%Y-%m-%d %H:%M') AS w_start,
       CAST(COALESCE(n, 0) AS BIGINT) AS n,
       COALESCE(rev, 0.0) AS rev,
       filled
FROM filledt
ORDER BY w_start
""",
    "q124_rolling_time_range": """
SELECT user_id, event_id,
       COUNT(*) OVER w AS n_2h,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) OVER w AS BIGINT)
         AS sum_cents_2h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 2 HOUR PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
""",
    "q125_time_weighted_avg": """
WITH d AS (
  SELECT user_id,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
         CAST(EPOCH_US(LEAD(ts) OVER (PARTITION BY user_id ORDER BY event_id))
              - EPOCH_US(ts) AS BIGINT) AS dur_us
  FROM events
)
SELECT user_id,
       CAST(ROUND(1e4 * SUM(cents * dur_us) / SUM(dur_us), 0) AS BIGINT)
         AS twap_e4_cents
FROM d
WHERE dur_us IS NOT NULL
GROUP BY user_id
ORDER BY user_id
""",
    "q126_interpolate": """
WITH base AS (
  SELECT user_id, event_id, ts,
         CASE WHEN event_id % 3 = 0 THEN value END AS v,
         EPOCH_US(ts) AS t
  FROM events
),
nb AS (
  SELECT user_id, event_id, v, t,
         LAST_VALUE(v IGNORE NULLS) OVER wp AS prev_v,
         LAST_VALUE(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER wp AS prev_t,
         FIRST_VALUE(v IGNORE NULLS) OVER wn AS next_v,
         FIRST_VALUE(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER wn AS next_t
  FROM base
  WINDOW wp AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         wn AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
)
SELECT user_id, event_id,
       CAST(ROUND(
         CASE WHEN v IS NOT NULL THEN v * 1e4
              WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                   AND next_t <> prev_t
              THEN prev_v * 1e4
                   + (next_v - prev_v) * 1e4 * (t - prev_t) / (next_t - prev_t)
              -- zero gap (tied timestamps): carry prev, mirroring the
              -- engine's guarded branch
              WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
              THEN prev_v * 1e4
         END, 0) AS BIGINT) AS interp_e4
FROM nb
ORDER BY user_id, event_id
""",
    "q129_resample_per_key": """
WITH b AS (
  SELECT user_id, DATE_TRUNC('hour', MIN(ts)) AS h0,
         DATE_TRUNC('hour', MAX(ts)) AS h1
  FROM events GROUP BY user_id
),
spine AS (
  SELECT user_id, UNNEST(GENERATE_SERIES(h0, h1, INTERVAL 1 HOUR)) AS bucket
  FROM b
),
hourly AS (
  SELECT user_id, DATE_TRUNC('hour', ts) AS bucket, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT s.user_id, STRFTIME(s.bucket, '%Y-%m-%d %H:%M') AS w_start,
       CAST(LAST_VALUE(h.n IGNORE NULLS)
            OVER (PARTITION BY s.user_id ORDER BY s.bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS n,
       h.bucket IS NULL AS filled
FROM spine s LEFT JOIN hourly h
  ON s.user_id = h.user_id AND s.bucket = h.bucket
ORDER BY s.user_id, w_start
""",
}
