"""Q14–Q30: distinct/grouping-set aggregates, analytic window functions,
sort/limit/pagination, set operations (SURVEY.md §2.4/§2.6/§2.7).

Determinism notes baked into every query (§2.10 policy): total ORDER BY,
ROUND on double outputs, window orders use the unique event_id (ts is
monotone in it — FIXTURES.md) so ties can't reorder, grouping-set NULL
markers are COALESCEd away and replaced by explicit GROUPING flags, and
rank/ntile outputs are cast to long to match duckdb's BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pandas_streaming_spark.catalog import load_table


# moved to timeseries.py in round 6 (module split); re-exported for compatibility
from pandas_streaming_spark.queries.timeseries import (  # noqa: F401
    q112_percentile_bins,
    q116_group_quantiles,
    q118_approx_quantile_audit,
    q123_resample_ffill,
    q124_rolling_time_range,
    q125_time_weighted_avg,
    q126_interpolate,
    q129_resample_per_key,
)

def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def q14_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("event_type")
    )


def q15_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    joined = c.join(n, c.c_nationkey == n.n_nationkey).join(
        r, n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_cust"),
            F.grouping("r_name").cast("int").alias("g_region"),
            F.grouping("n_name").cast("int").alias("g_nation"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("r_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("n_name"),
            "n_cust",
            "g_region",
            "g_nation",
        )
        .orderBy("g_region", "g_nation", "r_name", "n_name")
    )


def q16_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "sum_qty",
            "g_flag",
            "g_status",
        )
        .orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus")
    )


def q17_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT COALESCE(event_type, 'ALL') AS event_type,
               COALESCE(user_id, -1) AS user_id,
               CAST(GROUPING(event_type) AS INT) AS g_type,
               CAST(GROUPING(user_id) AS INT) AS g_user,
               COUNT(*) AS n
        FROM events
        GROUP BY GROUPING SETS ((event_type), (user_id), ())
        ORDER BY g_type, g_user, event_type, user_id
        """
    )


def q18_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .select("c_mktsegment")
        .distinct()
        .orderBy("c_mktsegment")
    )


def q19_var_std(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.var_samp("l_quantity"), 2).alias("var_qty"),
            F.round(F.stddev_samp("l_quantity"), 2).alias("std_qty"),
        )
        .orderBy("l_returnflag")
    )


def q20_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 2).alias("median_price"),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), 2).alias("p90_price"),
        )
        .orderBy("o_orderstatus")
    )


def q21_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
        .orderBy("o_custkey", "rn")
    )


def q22_rank_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    return (
        p.select(
            "p_brand",
            "p_partkey",
            F.round("p_retailprice", 2).alias("p_retailprice"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
        )
        .orderBy("p_brand", F.col("p_retailprice").desc(), "p_partkey")
    )


def q23_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    return (
        e.select(
            "user_id",
            "event_id",
            F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta"),
        )
        .orderBy("user_id", "event_id")
        .limit(200)
    )


def q24_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-frame average, reported in integer cents. Floats are summed
    as exact integer cents and divided once — incremental window
    aggregation (duckdb subtracts expiring rows; Spark re-adds) would
    otherwise differ in the last ulp. The final round is at integer scale
    because a two-decimal round can land on a .xx5 *shortest-repr* where
    Spark (rounds the decimal repr) and duckdb (rounds the binary value)
    disagree; .5 at integer scale is binary-exact, so both round it away
    from zero identically."""
    e = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("long")
    w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-2, 0)
    avg_cents = F.sum(cents).over(w) / F.count(F.lit(1)).over(w).cast("double")
    return (
        e.select(
            "user_id",
            "event_id",
            F.round(avg_cents, 0).cast("long").alias("mov_avg_cents"),
        )
        .orderBy("user_id", "event_id")
    )


def q25_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.select(
            "user_id",
            "event_id",
            F.round(F.sum("value").over(w), 2).alias("run_sum"),
        )
        .orderBy("user_id", "event_id")
    )


def q26_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(F.ntile(4).over(w).cast("long").alias("tile"), "o_totalprice")
        .groupBy("tile")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("sum_price"))
        .orderBy("tile")
    )


def q27_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            # dates travel as formatted strings: DATE-typed cells stringify
            # differently via pandas on the two engines
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        )
        .limit(10)
    )


def q28_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
        .offset(100)
        .limit(20)
    )


def q29_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("key"),
        F.col("s_name").alias("name"),
        F.round("s_acctbal", 2).alias("acctbal"),
        F.lit("S").alias("src"),
    )
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"),
        F.col("c_name").alias("name"),
        F.round("c_acctbal", 2).alias("acctbal"),
        F.lit("C").alias("src"),
    )
    return s.unionByName(c).orderBy("src", "key")


def q29_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    return s.union(c).distinct().orderBy("nationkey")


def q30_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    big = o.filter(F.col("o_totalprice") > 150000).select(
        F.col("o_custkey").alias("custkey")
    )
    return building.intersect(big).orderBy("custkey")


def q30_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    big = o.filter(F.col("o_totalprice") > 150000).select(
        F.col("o_custkey").alias("custkey")
    )
    return building.subtract(big).orderBy("custkey")


def q70_analytic_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / first / last / nth_value over an explicit full
    frame (the §2.6 rows not covered by q21–q26). percent_rank's single
    division is bit-identical across engines — no rounding needed."""
    p = _t(spark, sf_dir, "part")
    order = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    full = order.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        p.select(
            "p_brand",
            "p_partkey",
            F.percent_rank().over(order).alias("pct_rank"),
            F.round(F.first("p_retailprice").over(full), 2).alias("brand_top_price"),
            F.round(F.last("p_retailprice").over(full), 2).alias("brand_bottom_price"),
            F.round(F.nth_value("p_retailprice", 2).over(full), 2).alias("brand_2nd_price"),
        )
        .orderBy("p_brand", "pct_rank", "p_partkey")
        .limit(200)
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q77_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas pivot_table via groupBy().pivot() with an explicit column
    domain (no distinct pre-scan — at scale the pivot domain must be
    declared, not discovered)."""
    from pandas_streaming_spark.api import wrap

    ev = _t(spark, sf_dir, "events")
    wide = wrap(ev).pivot_table(
        "user_id", "event_type", "value", aggfunc="sum", col_values=EVENT_TYPES
    ).df
    return wide.select(
        "user_id", *[F.round(F.col(t), 2).alias(t) for t in EVENT_TYPES]
    ).orderBy("user_id")


def q78_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas melt (wide→long) via native unpivot — narrow expansion,
    no shuffle until the final sort."""
    from pandas_streaming_spark.api import wrap

    ev = _t(spark, sf_dir, "events")
    wide = ev.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.round(F.avg("value"), 2).alias("avg_value"),
    )
    return (
        wrap(wide)
        .melt(["event_type"], ["n_events", "sum_value", "avg_value"],
              var_name="metric", value_name="val")
        .df.orderBy("event_type", "metric")
    )


def q88_salted_hot_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end skew path (operators.skew.salted_groupby): a synthetic
    hot key funnels ~97% of events into ONE group (event_id % 100 < 97 →
    'hot'), the single-hot-reducer shape AQE cannot split for an
    aggregation. The two-phase salted plan spreads the hot group over 16
    reducers, then combines 16 partials per key.

    Value sums use exact integer cents (floor(value*100)) so the salted
    re-association is bit-identical to the oracle's single-phase SUM —
    the same fixed-point policy as q24/q87.
    """
    from pandas_streaming_spark.operators.skew import salted_groupby

    ev = _t(spark, sf_dir, "events").select(
        F.when(F.col("event_id") % 100 < 97, F.lit("hot"))
        .otherwise(F.col("event_type"))
        .alias("k"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    out = salted_groupby(
        ev,
        keys=["k"],
        aggs={
            "n": ("cents", "count"),
            "sum_cents": ("cents", "sum"),
            "min_cents": ("cents", "min"),
            "max_cents": ("cents", "max"),
        },
        salt=16,
    )
    return out.select(
        "k",
        F.col("n").cast("long").alias("n"),
        F.col("sum_cents").cast("long").alias("sum_cents"),
        "min_cents",
        "max_cents",
        # avg in e2 micro-units from the two exact integers
        F.round(F.col("sum_cents") / F.col("n"), 0).cast("long").alias("avg_cents"),
    ).orderBy("k")


def q94_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-stage conversion funnel signup→view→click→purchase over
    events (operators.funnel.funnel_counts): stage k counts users whose
    earliest type-k event is strictly after their stage-(k−1) time.
    Single-shuffle chained-running-min window plan — no per-stage
    self-joins; the oracle states the same semantics as a join chain."""
    from pandas_streaming_spark.operators.funnel import funnel_counts

    return funnel_counts(
        _t(spark, sf_dir, "events"), ["signup", "view", "click", "purchase"]
    )


def q105_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event session labels (operators.sessionize): 30-minute-gap
    sessions matching q45's boundary contract, emitted as event-level
    features rather than per-session aggregates."""
    from pandas_streaming_spark.operators.sessionize import sessionize

    return (
        sessionize(_t(spark, sf_dir, "events"), gap_minutes=30)
        .select("event_id", "user_id", "session_idx")
        .orderBy("event_id")
    )


def q166_recursive_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4.0 WITH RECURSIVE) — linked-list
    sessionization as transitive closure: a window pass precomputes each
    purchase's predecessor link, session heads (gap > 30 min) anchor the
    recursion, and the recursive term walks the unique prev_id linkage,
    carrying the head's timestamp as the session id. Exactly the
    gaps-and-islands result (q105/q154 compute it with one running-max
    window), derived through the engine's iterative-plan machinery
    instead — duckdb runs the SAME recursive SQL as the oracle, so the
    recursion semantics (anchor + UNION ALL fixpoint) are what's graded.
    Recursion depth = max session length, not data size — which is also
    the honest scale boundary: the 10x probe measures 11.8x growth
    because the replica's duplicated timestamps stretch every session
    10x, and each extra link is one more iterative join over the base.
    Recursive CTEs are the right tool for bounded-depth closures
    (hierarchies, short chains); unbounded sessionization at corpus
    scale belongs to the single-window gaps-and-islands form this repo
    grades as q105/q154. Gaps compare on unix_micros (exact int64 on
    both engines)."""
    _t(spark, sf_dir, "events").createOrReplaceTempView("__ev_q166")
    return spark.sql("""
WITH RECURSIVE base AS (
  SELECT user_id, event_id, ts,
         LAG(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_id,
         unix_micros(ts) - LAG(unix_micros(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM __ev_q166 WHERE event_type = 'purchase'
),
chain AS (
  SELECT user_id, event_id, ts AS session_start
  FROM base WHERE prev_id IS NULL OR gap_us > 1800000000
  UNION ALL
  SELECT b.user_id, b.event_id, c.session_start
  FROM base b JOIN chain c
    ON b.prev_id = c.event_id AND b.gap_us <= 1800000000
),
sess AS (
  SELECT user_id, session_start, COUNT(*) AS n
  FROM chain GROUP BY user_id, session_start
)
SELECT user_id,
       COUNT(*) AS n_sessions,
       CAST(SUM(n) AS BIGINT) AS n_purchases,
       CAST(MAX(n) AS BIGINT) AS max_session
FROM sess
GROUP BY user_id
ORDER BY user_id
""")


def q190_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto front (skyline): orders not dominated on
    (o_totalprice, o_orderdate) — no other order is strictly better on
    one axis and >= on the other (maximize both; exact integer cents and
    epoch-day, so dominance is integer comparison on both engines).

    The engine form is the O(n log n) sweep, not the O(n²) dominance
    join. Strict-on-one-axis dominance decomposes into exactly two
    window maxima: p survives iff (a) its day BEATS the max day among
    STRICTLY richer rows (a RANGE frame ``cents+1 .. ∞`` — dominated by
    a richer-or-equal-day point otherwise), and (b) its day EQUALS the
    max day within its own cents value (an equal-cents row with a
    strictly later day dominates; exact duplicates tie the max and all
    survive, correct under strict-on-one dominance). Both maxima are
    integer comparisons — no float anywhere. At scale the global RANGE
    window is the textbook candidate for a per-partition-front-then-
    merge refinement (fronts are small by construction); the oracle is
    the O(n²) NOT EXISTS brute force, so any sweep-logic error on any
    tie pattern mismatches."""
    o = _t(spark, sf_dir, "orders")
    pts = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01")).alias("day"),
    )
    # DESC order + (unboundedPreceding, -1) ≡ "cents strictly greater",
    # and unbounded-PRECEDING range frames run on Spark's accumulating
    # O(n) window path; the equivalent ASC (1, unboundedFollowing) frame
    # uses the re-scanning UnboundedFollowing frame — measured O(n²),
    # ~100 s at the 10x axis for the same answer
    w_richer = Window.orderBy(F.col("cents").desc()).rangeBetween(
        Window.unboundedPreceding, -1
    )
    w_equal = Window.partitionBy("cents")
    front = (
        pts.withColumn("__mx_richer", F.max("day").over(w_richer))
        .withColumn("__mx_equal", F.max("day").over(w_equal))
        .filter(
            (F.col("__mx_richer").isNull() | (F.col("day") > F.col("__mx_richer")))
            & (F.col("day") == F.col("__mx_equal"))
        )
    )
    return (
        front.select("o_orderkey", "cents", "day")
        .orderBy(F.col("cents").desc(), F.col("day").desc(), "o_orderkey")
    )


def q227_mrr_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean Reciprocal Rank — the ranking-evaluation staple: per user,
    the 1-based position of the FIRST purchase in their (ts, event_id)
    event sequence; RR in exact micro-units (round(1e6/pos)); a
    __MEAN__ summary row carries MRR as the rounded ratio of the exact
    integer RR sum (no float accumulation — the per-user values are
    already integers). Users who never purchase contribute RR=0, the
    convention that makes MRR comparable across corpora. Scale: one
    key window for the position + one tiny aggregate."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pos = (
        ev.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("__rn").cast("long").alias("first_pos"))
    )
    allu = ev.select("user_id").distinct()
    per = allu.join(pos, "user_id", "left").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.coalesce("first_pos", F.lit(0)).cast("long").alias("first_pos"),
        F.when(
            F.col("first_pos").isNotNull(),
            F.round(F.lit(1e6) / F.col("first_pos"), 0).cast("long"),
        )
        .otherwise(F.lit(0))
        .alias("rr_e6"),
    )
    mean = per.agg(
        F.sum("rr_e6").alias("__s"), F.count("*").alias("__n")
    ).select(
        F.lit(-1).cast("long").alias("user_id"),
        F.lit(0).cast("long").alias("first_pos"),
        F.round(F.col("__s") / F.col("__n"), 0).cast("long").alias("rr_e6"),
    )
    return per.unionByName(mean).orderBy("user_id")


def q269_session_bounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly BOUNCE RATE — the engagement-health readout product
    analytics runs on top of sessionization (q105's islands, graded at
    the session-quality level): sessions are 30-minute-gap islands per
    user (head when the µs delta from the previous event exceeds 1800 s;
    ties broken by event_id so the island decomposition is a total
    order), a bounce is a single-event session, grouped by the session
    head's Monday-truncated week. Graded per week: sessions, bounces,
    bounce rate in bp. Scale: two user-partitioned windows + one
    (user, session) aggregate + one weekly rollup — every shuffle keyed
    on user_id or the tiny week key, no global sort."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", F.unix_micros("ts").alias("__us")
    )
    wo = Window.partitionBy("user_id").orderBy("__us", "event_id")
    heads = ev.withColumn(
        "__head",
        F.when(
            F.col("__us") - F.lag("__us").over(wo) > 1_800_000_000, 1
        ).otherwise(
            F.when(F.lag("__us").over(wo).isNull(), 1).otherwise(0)
        ),
    ).withColumn(
        "__sid",
        F.sum("__head").over(
            wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    sess = heads.groupBy("user_id", "__sid").agg(
        F.count("*").alias("__n"), F.min("ts").alias("__t0")
    )
    return (
        sess.groupBy(
            F.date_format(F.date_trunc("week", F.col("__t0")), "yyyy-MM-dd")
            .alias("week")
        )
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.sum(F.when(F.col("__n") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_bounces"),
        )
        .select(
            "week",
            "n_sessions",
            "n_bounces",
            F.round(F.lit(1e4) * F.col("n_bounces") / F.col("n_sessions"), 0)
            .cast("long")
            .alias("bounce_bp"),
        )
        .orderBy("week")
    )


QUERIES = {
    "q269_session_bounce": q269_session_bounce,
    "q227_mrr_metric": q227_mrr_metric,
    "q190_pareto_front": q190_pareto_front,
    "q166_recursive_session": q166_recursive_session,
    "q14_count_distinct": q14_count_distinct,
    "q15_rollup": q15_rollup,
    "q16_cube": q16_cube,
    "q17_grouping_sets": q17_grouping_sets,
    "q18_distinct": q18_distinct,
    "q19_var_std": q19_var_std,
    "q20_percentile": q20_percentile,
    "q21_topk_per_group": q21_topk_per_group,
    "q22_rank_dense_rank": q22_rank_dense_rank,
    "q23_lag_delta": q23_lag_delta,
    "q24_moving_avg": q24_moving_avg,
    "q25_running_sum": q25_running_sum,
    "q26_ntile": q26_ntile,
    "q27_global_topk": q27_global_topk,
    "q28_pagination": q28_pagination,
    "q29_union_all": q29_union_all,
    "q29_union_distinct": q29_union_distinct,
    "q30_intersect": q30_intersect,
    "q30_except": q30_except,
    "q70_analytic_fns": q70_analytic_fns,
    "q77_pivot": q77_pivot,
    "q78_melt": q78_melt,
    "q88_salted_hot_key": q88_salted_hot_key,
    "q94_funnel": q94_funnel,
    "q105_sessionize": q105_sessionize,
}

ORACLES = {
    # same 30-min µs islands with event_id tiebreak, Monday weeks
    "q269_session_bounce": """
WITH e AS (
  SELECT user_id, event_id, ts, EPOCH_US(ts) AS us FROM events
),
l AS (
  SELECT *, LAG(us) OVER (PARTITION BY user_id
                          ORDER BY us, event_id) AS pus
  FROM e
),
h AS (
  SELECT *, CASE WHEN pus IS NULL OR us - pus > 1800000000
                 THEN 1 ELSE 0 END AS head
  FROM l
),
s AS (
  SELECT *, SUM(head) OVER (PARTITION BY user_id ORDER BY us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM h
),
sess AS (
  SELECT user_id, sid, COUNT(*) AS n, MIN(ts) AS t0
  FROM s GROUP BY user_id, sid
)
SELECT STRFTIME(DATE_TRUNC('week', t0), '%Y-%m-%d') AS week,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
       CAST(ROUND(1e4 * SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                  / COUNT(*), 0) AS BIGINT) AS bounce_bp
FROM sess GROUP BY 1 ORDER BY week
""",
    # same first-purchase position; MRR from the exact integer RR sum
    "q227_mrr_metric": """
WITH r AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events
), pos AS (
  SELECT user_id, CAST(MIN(rn) AS BIGINT) AS first_pos
  FROM r WHERE event_type = 'purchase' GROUP BY user_id
), per AS (
  SELECT u.user_id,
         CAST(COALESCE(p.first_pos, 0) AS BIGINT) AS first_pos,
         CAST(CASE WHEN p.first_pos IS NOT NULL
                   THEN ROUND(1e6 / p.first_pos, 0) ELSE 0 END AS BIGINT)
           AS rr_e6
  FROM (SELECT DISTINCT user_id FROM events) u
  LEFT JOIN pos p USING (user_id)
)
SELECT user_id, first_pos, rr_e6 FROM per
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(0 AS BIGINT),
       CAST(ROUND(1.0 * SUM(rr_e6) / COUNT(*), 0) AS BIGINT)
FROM per
ORDER BY user_id
""",
    "q190_pareto_front": """
-- dominance is pointwise, so the O(n^2) NOT EXISTS runs over DISTINCT
-- points (replica-scaled axes duplicate every point 10/100x; the full
-- row form took ~2 min at 10x for identical semantics)
WITH pts AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         DATEDIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS day
  FROM orders
), dpts AS (
  SELECT DISTINCT cents, day FROM pts
), front_pts AS (
  SELECT cents, day FROM dpts p
  WHERE NOT EXISTS (
    SELECT 1 FROM dpts q
    WHERE (q.cents >= p.cents AND q.day >= p.day)
      AND (q.cents > p.cents OR q.day > p.day)
  )
)
SELECT o_orderkey, cents, CAST(day AS INT) AS day
FROM pts JOIN front_pts USING (cents, day)
ORDER BY cents DESC, day DESC, o_orderkey
""",
    "q166_recursive_session": """
WITH RECURSIVE base AS (
  SELECT user_id, event_id, ts,
         LAG(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_id,
         EPOCH_US(ts) - LAG(EPOCH_US(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events WHERE event_type = 'purchase'
),
chain AS (
  SELECT user_id, event_id, ts AS session_start
  FROM base WHERE prev_id IS NULL OR gap_us > 1800000000
  UNION ALL
  SELECT b.user_id, b.event_id, c.session_start
  FROM base b JOIN chain c
    ON b.prev_id = c.event_id AND b.gap_us <= 1800000000
),
sess AS (
  SELECT user_id, session_start, COUNT(*) AS n
  FROM chain GROUP BY user_id, session_start
)
SELECT user_id,
       COUNT(*) AS n_sessions,
       CAST(SUM(n) AS BIGINT) AS n_purchases,
       CAST(MAX(n) AS BIGINT) AS max_session
FROM sess
GROUP BY user_id
ORDER BY user_id
""",
    "q14_count_distinct": """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
""",
    "q15_rollup": """
SELECT COALESCE(r_name, 'ALL') AS r_name, COALESCE(n_name, 'ALL') AS n_name,
       COUNT(*) AS n_cust,
       CAST(GROUPING(r_name) AS INT) AS g_region,
       CAST(GROUPING(n_name) AS INT) AS g_nation
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY g_region, g_nation, r_name, n_name
""",
    "q16_cube": """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY g_flag, g_status, l_returnflag, l_linestatus
""",
    "q17_grouping_sets": """
SELECT COALESCE(event_type, 'ALL') AS event_type,
       COALESCE(user_id, -1) AS user_id,
       CAST(GROUPING(event_type) AS INT) AS g_type,
       CAST(GROUPING(user_id) AS INT) AS g_user,
       COUNT(*) AS n
FROM events
GROUP BY GROUPING SETS ((event_type), (user_id), ())
ORDER BY g_type, g_user, event_type, user_id
""",
    "q18_distinct": """
SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment
""",
    "q19_var_std": """
SELECT l_returnflag, ROUND(VAR_SAMP(l_quantity), 2) AS var_qty,
       ROUND(STDDEV_SAMP(l_quantity), 2) AS std_qty
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    "q20_percentile": """
SELECT o_orderstatus,
       ROUND(QUANTILE_CONT(o_totalprice, 0.5), 2) AS median_price,
       ROUND(QUANTILE_CONT(o_totalprice, 0.9), 2) AS p90_price
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
    "q21_topk_per_group": """
SELECT o_custkey, rn, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders)
WHERE rn <= 3
ORDER BY o_custkey, rn
""",
    "q22_rank_dense_rank": """
SELECT p_brand, p_partkey, ROUND(p_retailprice, 2) AS p_retailprice,
       RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS rnk,
       DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS drnk
FROM part
ORDER BY p_brand, p_retailprice DESC, p_partkey
""",
    "q23_lag_delta": """
SELECT user_id, event_id,
       ROUND(value - LAG(value) OVER (PARTITION BY user_id ORDER BY event_id), 2) AS delta
FROM events
ORDER BY user_id, event_id
LIMIT 200
""",
    "q24_moving_avg": """
SELECT user_id, event_id,
       CAST(ROUND(SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER w
             / CAST(COUNT(*) OVER w AS DOUBLE), 0) AS BIGINT) AS mov_avg_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
""",
    "q25_running_sum": """
SELECT user_id, event_id,
       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_sum
FROM events
ORDER BY user_id, event_id
""",
    "q26_ntile": """
SELECT tile, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS sum_price
FROM (
  SELECT NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS tile, o_totalprice
  FROM orders)
GROUP BY tile ORDER BY tile
""",
    "q27_global_topk": """
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice,
       STRFTIME(o_orderdate, '%Y-%m-%d') AS o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
    "q28_pagination": """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20 OFFSET 100
""",
    "q29_union_all": """
SELECT s_suppkey AS key, s_name AS name, ROUND(s_acctbal, 2) AS acctbal, 'S' AS src FROM supplier
UNION ALL
SELECT c_custkey, c_name, ROUND(c_acctbal, 2), 'C' FROM customer
ORDER BY src, key
""",
    "q29_union_distinct": """
SELECT s_nationkey AS nationkey FROM supplier
UNION
SELECT c_nationkey FROM customer
ORDER BY nationkey
""",
    "q30_intersect": """
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey FROM orders WHERE o_totalprice > 150000
ORDER BY custkey
""",
    "q30_except": """
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT o_custkey FROM orders WHERE o_totalprice > 150000
ORDER BY custkey
""",
    "q70_analytic_fns": """
SELECT p_brand, p_partkey,
       PERCENT_RANK() OVER o AS pct_rank,
       ROUND(FIRST_VALUE(p_retailprice) OVER f, 2) AS brand_top_price,
       ROUND(LAST_VALUE(p_retailprice) OVER f, 2) AS brand_bottom_price,
       ROUND(NTH_VALUE(p_retailprice, 2) OVER f, 2) AS brand_2nd_price
FROM part
WINDOW o AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey),
       f AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY p_brand, pct_rank, p_partkey
LIMIT 200
""",
    "q77_pivot": """
SELECT user_id,
       ROUND(SUM(CASE WHEN event_type = 'click' THEN value END), 2) AS click,
       ROUND(SUM(CASE WHEN event_type = 'error' THEN value END), 2) AS error,
       ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
       ROUND(SUM(CASE WHEN event_type = 'signup' THEN value END), 2) AS signup,
       ROUND(SUM(CASE WHEN event_type = 'view' THEN value END), 2) AS view
FROM events
GROUP BY user_id
ORDER BY user_id
""",
    "q78_melt": """
WITH wide AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n_events,
         ROUND(SUM(value), 2) AS sum_value,
         ROUND(AVG(value), 2) AS avg_value
  FROM events GROUP BY event_type
)
SELECT event_type, metric, val FROM (
  SELECT event_type, 'n_events' AS metric, n_events AS val FROM wide
  UNION ALL
  SELECT event_type, 'sum_value', sum_value FROM wide
  UNION ALL
  SELECT event_type, 'avg_value', avg_value FROM wide
)
ORDER BY event_type, metric
""",
    "q88_salted_hot_key": """
WITH keyed AS (
  SELECT CASE WHEN event_id % 100 < 97 THEN 'hot' ELSE event_type END AS k,
         CAST(FLOOR(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT k, COUNT(cents) AS n,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       MIN(cents) AS min_cents,
       MAX(cents) AS max_cents,
       CAST(ROUND(CAST(SUM(cents) AS DOUBLE) / COUNT(cents), 0) AS BIGINT) AS avg_cents
FROM keyed
GROUP BY k
ORDER BY k
""",
    "q94_funnel": """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY e.user_id
),
s4 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s3 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY e.user_id
)
SELECT * FROM (
  SELECT CAST(1 AS INT) AS stage_no, 'signup' AS stage, COUNT(*) AS n_users FROM s1
  UNION ALL
  SELECT CAST(2 AS INT), 'view', COUNT(*) FROM s2
  UNION ALL
  SELECT CAST(3 AS INT), 'click', COUNT(*) FROM s3
  UNION ALL
  SELECT CAST(4 AS INT), 'purchase', COUNT(*) FROM s4
)
ORDER BY stage_no
""",
    "q105_sessionize": """
WITH o AS (
  SELECT event_id, user_id, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
f AS (
  SELECT event_id, user_id,
         CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS flag,
         ts
  FROM o
)
SELECT event_id, user_id,
       CAST(SUM(flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
FROM f
ORDER BY event_id
""",
    # QUANTILE_CONT shares Spark percentile()'s (n-1)p linear
    # interpolation; quarter probs over integer n_chars keep every
    # boundary exact in binary, so bin edges and quantile values agree
    # bit-for-bit across engines
    # the sketch value is partition-dependent, so the oracle asserts the
    # deterministic parts: row count, exact quantile, and that the GK
    # rank-error guarantee held (TRUE by contract)
    # mirrors interpolate_linear's expression tree exactly: prev*1e4 +
    # ((next-prev)*1e4*(t-tp))/(tn-tp), all left-assoc, one division
}
