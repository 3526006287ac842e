"""Q01–Q13: scan/filter/agg + the full join family (SURVEY.md §2.10).

Every query is declarative DataFrame API — Catalyst handles predicate
pushdown into the parquet scan, column pruning, and join strategy
selection (broadcast for the dims, sort-merge for fact-fact). Explicit
``F.broadcast`` only on the always-tiny dims (region, nation); the rest is
left to ``autoBroadcastJoinThreshold`` + AQE so plans stay correct when a
"dim" is big at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pandas_streaming_spark.catalog import load_table
from pandas_streaming_spark.operators.asof import asof_join_auto

SHIP_CUTOFF = "1998-09-02"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit(SHIP_CUTOFF)))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 2).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q02_projection_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .filter((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 100000))
        .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
        .orderBy("o_orderkey")
    )


def q03_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        )
        .orderBy("r_name")
    )


def q04_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


def q05_left_outer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


def q06_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        c.join(big, c.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal"))
        .orderBy("c_custkey")
        .limit(100)
    )


def q07_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        c.join(big, c.c_custkey == big.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def q08_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    joined = s.join(c, s.s_nationkey == c.c_nationkey, "full_outer")
    return (
        joined.groupBy(
            F.coalesce("s_nationkey", "c_nationkey").alias("nationkey")
        )
        .agg(
            F.countDistinct("s_suppkey").alias("n_supp"),
            F.countDistinct("c_custkey").alias("n_cust"),
        )
        .orderBy("nationkey")
    )


def q09_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(
            p,
            (li.l_partkey == p.p_partkey) & (li.l_quantity > p.p_size),
        )
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_items"))
        .orderBy("p_brand")
    )


def q10_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name").orderBy("r_name", "n_name")


def q11_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (§4.2 custom op #1): for each order, the latest event of
    the synthetic user key (o_custkey % 20) with event-second <= order
    date; aggregated per user. Round 7 (VERDICT r6 item 2) cost-gates the
    plan: below ~128 MB of estimated input the plain key-partitioned
    union+window wins (lowest constant factor); above it the time-bucketed
    plan partitions on (key, day-bucket) so parallelism scales with data
    span instead of the 20-value key cardinality. Selection reads
    Catalyst's free plan-size statistics — no counting job — and both
    plans are differential-tested against each other and pd.merge_asof."""
    o = _t(spark, sf_dir, "orders").withColumn(
        "user_id", (F.col("o_custkey") % 20).cast("long")
    )
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("second", "ts").alias("ets"),
        "event_id",
        F.col("value").alias("ev_value"),
    )
    # Algebraic collapse: the as-of fill is a deterministic function of
    # (key, left_time), and this query's left times are DATE-grained, so
    # orders sharing (user_id, o_orderdate) all receive the same event.
    # Collapse the fact to distinct (key, date) cells first (hash agg,
    # ~|keys| x |days| rows regardless of fact size — the join input stops
    # growing with the data), as-of join the cells, then expand the final
    # aggregates by the per-cell order count. Same algebra a smart user
    # (or a dedupe-before-join optimizer) applies; result is bit-identical.
    cells = o.groupBy("user_id", "o_orderdate").agg(F.count("*").alias("n_ord"))
    joined = asof_join_auto(
        cells,
        e,
        key="user_id",
        left_time="o_orderdate",
        right_time="ets",
        value_cols=["ev_value"],
        bucket_seconds=86400.0,  # daily grain: |keys| x |days| cells
        right_ord="event_id",
    )
    return (
        joined.groupBy("user_id")
        .agg(
            F.sum("n_ord").alias("n_orders"),
            F.coalesce(
                F.sum(F.when(F.col("ev_value").isNotNull(), F.col("n_ord"))),
                F.lit(0),
            )
            .cast("long")
            .alias("n_matched"),
            F.round(F.sum(F.col("ev_value") * F.col("n_ord")), 2).alias("sum_value"),
        )
        .orderBy("user_id")
    )


def q12_groupby_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy("o_orderpriority")
    )


def q13_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_cust"))
        .filter(F.col("n_cust") > 5)
        .orderBy("n_name")
    )


def q68_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — exercises Catalyst's
    RewriteCorrelatedScalarSubquery decorrelation (SURVEY.md §4.1): the
    optimizer turns the per-row subquery into an aggregate + join."""
    from pandas_streaming_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, ROUND(c_acctbal, 2) AS c_acctbal
        FROM customer c
        WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        ORDER BY c_custkey
        LIMIT 200
        """
    )


def q69_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / NOT EXISTS — decorrelated to semi/anti joins."""
    from pandas_streaming_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_suppkey, s_name,
               CAST(EXISTS (SELECT 1 FROM lineitem l
                            WHERE l.l_suppkey = s.s_suppkey
                              AND l.l_quantity > 45) AS INT) AS has_big_shipment
        FROM supplier s
        WHERE EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_suppkey = s.s_suppkey)
        ORDER BY s_suppkey
        """
    )


def q73_decimal_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-decimal pricing (SURVEY §1.2 decimal note): money doubles are
    cast to DECIMAL(12,2) and every product/sum stays in decimal, so the
    revenue is exact to 6 decimal places with no float drift. (12,2) keeps
    the three-way product inside both engines' 38-digit cap — duckdb
    *errors* past it rather than rounding, Spark silently drops scale.
    Compared as exact integer micro-units."""
    li = _t(spark, sf_dir, "lineitem")
    dec = "decimal(12,2)"
    price = F.col("l_extendedprice").cast(dec)
    disc = F.col("l_discount").cast(dec)
    tax = F.col("l_tax").cast(dec)
    one = F.lit(1).cast(dec)
    rev = price * (one - disc) * (one + tax)
    return (
        li.groupBy("l_returnflag")
        .agg(
            (F.sum(rev) * F.lit(1000000)).cast("long").alias("revenue_e6"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


def q200_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair co-occurrence (the support-counting core of
    frequent-itemset mining): part pairs ordered together, counted over
    orders, support >= 2. Plan: DISTINCT (order, part) first, then a
    self equi-join ON the order key with ``p1 < p2`` — the candidate
    count is sum(C(k_o, 2)) with the per-order basket k_o schema-bounded
    (<= 7 lineitems), i.e. LINEAR in orders, never the all-pairs part x
    part square; the order key is uniform so the join exchange has no
    hot key, and the pair aggregate is map-side combinable. Unbounded
    baskets at 100 TB get a per-basket top-k cap before the self-join
    (the standard A-priori guard). Output ordered (n_orders DESC, p1,
    p2) — exact integers, total order."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    return (
        li.select("l_orderkey", F.col("l_partkey").alias("p1"))
        .join(
            li.select("l_orderkey", F.col("l_partkey").alias("p2")).hint(
                "shuffle_hash"
            ),
            "l_orderkey",
        )
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count("*").cast("long").alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .orderBy(F.desc("n_orders"), "p1", "p2")
    )


def q248_item_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item Jaccard similarity — the collaborative-filtering
    normalization on top of q200's raw co-occurrence counts: for part
    pairs co-ordered ≥ 3 times, similarity = co / (n_a + n_b − co)
    over per-part order sets, graded in exact basis points with the
    full (co, n1, n2) evidence alongside (the number an item-to-item
    recommender actually ranks by — raw support favors merely-popular
    pairs). Top-15 by (sim_bp desc, p1, p2). Plan: the pair frame is
    basket-bounded like q200 (linear in orders, never part × part);
    per-part counts broadcast back onto the pair frame; the top-15 is
    a TakeOrderedAndProject, no global sort."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    co = (
        li.select("l_orderkey", F.col("l_partkey").alias("p1"))
        .join(
            li.select("l_orderkey", F.col("l_partkey").alias("p2")).hint(
                "shuffle_hash"
            ),
            "l_orderkey",
        )
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count("*").cast("long").alias("co"))
        .filter(F.col("co") >= 3)
    )
    per = li.groupBy("l_partkey").agg(F.count("*").cast("long").alias("n"))
    return (
        co.join(per.select(F.col("l_partkey").alias("p1"), F.col("n").alias("n1")), "p1")
        .join(per.select(F.col("l_partkey").alias("p2"), F.col("n").alias("n2")), "p2")
        .select(
            "p1",
            "p2",
            "co",
            "n1",
            "n2",
            F.round(
                F.lit(1e4) * F.col("co") / (F.col("n1") + F.col("n2") - F.col("co")),
                0,
            )
            .cast("long")
            .alias("sim_bp"),
        )
        .orderBy(F.col("sim_bp").desc(), "p1", "p2")
        .limit(15)
    )


def q202_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (lower) median per group — quantity-weighted median
    line price per return flag: the smallest price whose cumulative
    weight reaches half the group total (``2*cumw >= totw``). Plan:
    collapse to DISTINCT price first (groupBy price -> weight sum, so
    the window sort runs on the price-vocabulary cardinality, not the
    row count), one running-sum window per group, pick the first
    crossing. All arithmetic on exact integers (cents x integer
    quantity), so the crossing comparison is cross-engine exact — no
    interpolation policy needed (lower-median convention). The oracle
    states the identical running-sum definition."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.round("l_quantity").cast("long").alias("w"),
    )
    per_price = li.groupBy("l_returnflag", "cents").agg(
        F.sum("w").alias("pw")
    )
    win = Window.partitionBy("l_returnflag").orderBy("cents")
    tot = Window.partitionBy("l_returnflag")
    crossed = per_price.select(
        "l_returnflag",
        "cents",
        F.sum("pw").over(win).alias("cumw"),
        F.sum("pw").over(tot).alias("totw"),
    ).filter(2 * F.col("cumw") >= F.col("totw"))
    return (
        crossed.groupBy("l_returnflag")
        .agg(
            F.min("cents").alias("med_cents"),
            F.max("totw").cast("long").alias("tot_weight"),
        )
        .orderBy("l_returnflag")
    )


def q205_quota_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy quota allocation — each part has a 100-unit budget,
    consumed by its lineitems in (shipdate, orderkey, linenumber)
    order; a line gets ``min(requested, remaining)``. Looks like a
    sequential scan, but one-sided allocation TELESCOPES:
    ``sum(allocated through i) = min(cum_requested_i, B)``, so
    ``allocated_i = min(S_i, B) - min(S_{i-1}, B)`` — one running-sum
    window per part, fully associative, no applyInPandas. (The
    two-sided clamp q199 is the op where this telescoping fails and the
    keyed scan is forced — this pair documents the boundary.) Graded
    per part: line counts by fill class and exact allocated/requested
    units. Scale: one key-partitioned window; per-part line counts are
    schema-bounded, and the aggregate is map-side combinable."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
        F.round("l_quantity").cast("long").alias("q"),
    )
    w = Window.partitionBy("l_partkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    b = F.lit(100)
    s = F.sum("q").over(w)
    alloc = F.least(s, b) - F.least(s - F.col("q"), b)
    return (
        li.withColumn("__a", alloc)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(F.when(F.col("__a") == F.col("q"), 1).otherwise(0))
            .cast("long")
            .alias("n_full"),
            F.sum(
                F.when(
                    (F.col("__a") > 0) & (F.col("__a") < F.col("q")), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_partial"),
            F.sum(F.when(F.col("__a") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_zero"),
            F.sum("__a").cast("long").alias("alloc_units"),
            F.sum("q").cast("long").alias("req_units"),
        )
        .orderBy("partkey")
    )


def q306_recsys_hitrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline RECOMMENDER EVAL — hit-rate@3 under a leave-last-order-out
    holdout (the offline protocol every co-occurrence/item-item
    recommender ships with, next to the repo's MRR q227 / nDCG q301 /
    AUC q302 evals): each customer's LAST order (o_orderdate desc,
    o_orderkey desc) is held out; co-occurrence counts are trained on
    the REMAINING orders only (leakage-free by construction — the
    held-out baskets never enter the pair counts); each customer is
    recommended the top-3 parts by summed co-occurrence with their
    history parts (ties → part asc), already-owned parts excluded; a
    customer is a HIT if any recommended part appears in the held-out
    basket. Graded per market segment: eligible customers, hits, and
    hit-rate ppm — all exact integers. Scale: baskets are
    schema-bounded (≤ 7 lineitems) so the pair self-join is linear in
    orders (q200's A-priori guard applies unbounded); scoring is one
    (part-keyed) join from the history frame onto the bounded pair
    table; top-3 is a per-customer window over candidate rows. The
    metric column is named hitrate_TOP20CAND_ppm because the number is
    hit-rate@3 UNDER the top-20 co-part candidate generator (the serving
    truncation below) — the label travels with the value wherever it is
    consumed (VERDICT r12 item 3)."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    ranked = o.withColumn("__rn", F.row_number().over(w))
    held = ranked.filter(F.col("__rn") == 1).select("o_custkey", "o_orderkey")
    hist = ranked.filter(F.col("__rn") >= 2).select("o_custkey", "o_orderkey")
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    train_li = li.join(
        held.select(F.col("o_orderkey").alias("l_orderkey")),
        "l_orderkey",
        "left_anti",
    )
    pairs = (
        train_li.select("l_orderkey", F.col("l_partkey").alias("p1"))
        .join(
            train_li.select("l_orderkey", F.col("l_partkey").alias("p2")),
            "l_orderkey",
        )
        .filter(F.col("p1") != F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count("*").cast("long").alias("__cnt"))
    )
    # neighborhood truncation — the standard item-item serving form
    # (keep each part's top-20 co-parts): without it the scoring fan is
    # |history| x |all co-parts| (measured 11M rows at sf0.1); with it
    # the fan is |history| x 20 and the result is unchanged whenever
    # recommendations come from strong neighbors (pinned by the oracle,
    # which applies the SAME truncation)
    wnb = Window.partitionBy("p1").orderBy(F.col("__cnt").desc(), "p2")
    pairs = pairs.withColumn("__nr", F.row_number().over(wnb)).filter(
        F.col("__nr") <= 20
    ).drop("__nr")
    hist_parts = (
        hist.join(li, hist.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    scores = (
        hist_parts.join(pairs, hist_parts.l_partkey == pairs.p1)
        .groupBy("o_custkey", "p2")
        .agg(F.sum("__cnt").alias("__score"))
        .join(
            hist_parts.select(
                "o_custkey", F.col("l_partkey").alias("p2")
            ),
            ["o_custkey", "p2"],
            "left_anti",
        )
    )
    wtop = Window.partitionBy("o_custkey").orderBy(
        F.col("__score").desc(), "p2"
    )
    top3 = scores.withColumn("__r", F.row_number().over(wtop)).filter(
        F.col("__r") <= 3
    )
    held_parts = (
        held.join(li, held.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    hits = (
        top3.join(
            held_parts,
            (top3.o_custkey == held_parts.o_custkey)
            & (top3.p2 == held_parts.l_partkey),
        )
        .select(top3.o_custkey)
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    universe = (
        held_parts.select("o_custkey")
        .distinct()
        .join(hist_parts.select("o_custkey").distinct(), "o_custkey")
    )
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    return (
        universe.join(hits, "o_custkey", "left")
        .join(c, "o_custkey")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum(F.coalesce("__hit", F.lit(0))).cast("long").alias("n_hits"),
        )
        .select(
            "c_mktsegment",
            "n_users",
            "n_hits",
            F.round(F.lit(1e6) * F.col("n_hits") / F.col("n_users"), 0)
            .cast("long")
            .alias("hitrate_top20cand_ppm"),
        )
        .orderBy("c_mktsegment")
    )


QUERIES = {
    "q306_recsys_hitrate": q306_recsys_hitrate,
    "q01_pricing_summary": q01_pricing_summary,
    "q200_copurchase_pairs": q200_copurchase_pairs,
    "q248_item_similarity": q248_item_similarity,
    "q202_weighted_median": q202_weighted_median,
    "q205_quota_allocation": q205_quota_allocation,
    "q02_projection_filter": q02_projection_filter,
    "q03_broadcast_join": q03_broadcast_join,
    "q04_star_join_revenue": q04_star_join_revenue,
    "q05_left_outer_counts": q05_left_outer_counts,
    "q06_semi_join": q06_semi_join,
    "q07_anti_join": q07_anti_join,
    "q08_full_outer": q08_full_outer,
    "q09_theta_join": q09_theta_join,
    "q10_cross_join": q10_cross_join,
    "q11_asof_join": q11_asof_join,
    "q12_groupby_multi_agg": q12_groupby_multi_agg,
    "q13_having": q13_having,
    "q68_scalar_subquery": q68_scalar_subquery,
    "q69_exists_subquery": q69_exists_subquery,
    "q73_decimal_pricing": q73_decimal_pricing,
}

ORACLES = {
    # leave-last-order-out holdout, leakage-free pair training, top-3 by
    # (score desc, part), per-segment hit-rate ppm
    "q306_recsys_hitrate": """
WITH ranked AS (
  SELECT o_custkey, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
),
held AS (SELECT o_custkey, o_orderkey FROM ranked WHERE rn = 1),
hist AS (SELECT o_custkey, o_orderkey FROM ranked WHERE rn >= 2),
li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
train_li AS (
  SELECT * FROM li
  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM held)
),
pairs0 AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM train_li a JOIN train_li b
    ON b.l_orderkey = a.l_orderkey AND b.l_partkey <> a.l_partkey
  GROUP BY 1, 2
),
pairs AS (
  SELECT p1, p2, cnt FROM (
    SELECT p1, p2, cnt,
           ROW_NUMBER() OVER (PARTITION BY p1
                              ORDER BY cnt DESC, p2) AS nr
    FROM pairs0
  ) WHERE nr <= 20
),
hist_parts AS (
  SELECT DISTINCT h.o_custkey, li.l_partkey
  FROM hist h JOIN li ON li.l_orderkey = h.o_orderkey
),
scores AS (
  SELECT hp.o_custkey, p.p2, SUM(p.cnt) AS score
  FROM hist_parts hp JOIN pairs p ON p.p1 = hp.l_partkey
  GROUP BY 1, 2
),
fresh AS (
  SELECT s.* FROM scores s
  LEFT JOIN hist_parts hp
    ON hp.o_custkey = s.o_custkey AND hp.l_partkey = s.p2
  WHERE hp.o_custkey IS NULL
),
top3 AS (
  SELECT o_custkey, p2 FROM (
    SELECT o_custkey, p2,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY score DESC, p2) AS r
    FROM fresh
  ) WHERE r <= 3
),
held_parts AS (
  SELECT DISTINCT h.o_custkey, li.l_partkey
  FROM held h JOIN li ON li.l_orderkey = h.o_orderkey
),
hits AS (
  SELECT DISTINCT t.o_custkey
  FROM top3 t JOIN held_parts hp
    ON hp.o_custkey = t.o_custkey AND hp.l_partkey = t.p2
),
universe AS (
  SELECT DISTINCT hp.o_custkey
  FROM held_parts hp
  WHERE hp.o_custkey IN (SELECT o_custkey FROM hist_parts)
)
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN u.o_custkey IN (SELECT o_custkey FROM hits)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       CAST(ROUND(1e6 * SUM(CASE WHEN u.o_custkey IN
                                      (SELECT o_custkey FROM hits)
                                 THEN 1 ELSE 0 END) / COUNT(*), 0) AS BIGINT)
         AS hitrate_top20cand_ppm
FROM universe u JOIN customer c ON c.c_custkey = u.o_custkey
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
""",
    # same basket-bounded pair frame, per-part order counts, exact bp
    "q248_item_similarity": """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
co AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, CAST(COUNT(*) AS BIGINT) AS co
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
   AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 3
),
per AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n FROM li GROUP BY 1)
SELECT p1, p2, co, pa.n AS n1, pb.n AS n2,
       CAST(ROUND(1e4 * co / (pa.n + pb.n - co), 0) AS BIGINT) AS sim_bp
FROM co JOIN per pa ON pa.l_partkey = co.p1
        JOIN per pb ON pb.l_partkey = co.p2
ORDER BY sim_bp DESC, p1, p2
LIMIT 15
""",
    # identical telescoped prefix-sum form (the greedy fold and this
    # closed form are provably equal for one-sided budgets)
    "q205_quota_allocation": """
WITH li AS (
  SELECT l_partkey, CAST(ROUND(l_quantity) AS BIGINT) AS q,
         SUM(CAST(ROUND(l_quantity) AS BIGINT))
           OVER (PARTITION BY l_partkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber) AS s
  FROM lineitem
), a AS (
  SELECT l_partkey, q, LEAST(s, 100) - LEAST(s - q, 100) AS a FROM li
)
SELECT l_partkey AS partkey,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN a = q THEN 1 ELSE 0 END) AS BIGINT) AS n_full,
       CAST(SUM(CASE WHEN a > 0 AND a < q THEN 1 ELSE 0 END) AS BIGINT)
         AS n_partial,
       CAST(SUM(CASE WHEN a = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
       CAST(SUM(a) AS BIGINT) AS alloc_units,
       CAST(SUM(q) AS BIGINT) AS req_units
FROM a GROUP BY l_partkey ORDER BY partkey
""",
    "q200_copurchase_pairs": """
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
)
SELECT a.l_partkey AS p1, b.l_partkey AS p2,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM li a JOIN li b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2 HAVING COUNT(*) >= 2
ORDER BY n_orders DESC, p1, p2
""",
    # identical running-sum lower-median definition on exact integers
    "q202_weighted_median": """
WITH li AS (
  SELECT l_returnflag,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(ROUND(l_quantity) AS BIGINT) AS w
  FROM lineitem
), pp AS (
  SELECT l_returnflag, cents, SUM(w) AS pw
  FROM li GROUP BY 1, 2
), run AS (
  SELECT l_returnflag, cents,
         SUM(pw) OVER (PARTITION BY l_returnflag ORDER BY cents) AS cumw,
         SUM(pw) OVER (PARTITION BY l_returnflag) AS totw
  FROM pp
)
SELECT l_returnflag, MIN(cents) AS med_cents,
       CAST(MAX(totw) AS BIGINT) AS tot_weight
FROM run WHERE 2 * cumw >= totw
GROUP BY l_returnflag ORDER BY l_returnflag
""",
    "q01_pricing_summary": f"""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 2) AS avg_qty,
       ROUND(AVG(l_extendedprice), 2) AS avg_price,
       ROUND(AVG(l_discount), 2) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{SHIP_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    "q02_projection_filter": """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
FROM orders
WHERE o_orderstatus = 'O' AND o_totalprice > 100000
ORDER BY o_orderkey
""",
    "q03_broadcast_join": """
SELECT r_name, COUNT(*) AS n_cust, ROUND(SUM(c_acctbal), 2) AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
""",
    "q04_star_join_revenue": """
SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
    "q05_left_outer_counts": """
SELECT c_custkey, COUNT(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
ORDER BY c_custkey
""",
    "q06_semi_join": """
SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS c_acctbal
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
ORDER BY c_custkey
LIMIT 100
""",
    "q07_anti_join": """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
ORDER BY c_custkey
""",
    "q08_full_outer": """
SELECT COALESCE(s_nationkey, c_nationkey) AS nationkey,
       COUNT(DISTINCT s_suppkey) AS n_supp,
       COUNT(DISTINCT c_custkey) AS n_cust
FROM supplier FULL OUTER JOIN customer ON s_nationkey = c_nationkey
GROUP BY COALESCE(s_nationkey, c_nationkey)
ORDER BY nationkey
""",
    "q09_theta_join": """
SELECT p_brand, COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey AND l_quantity > p_size
GROUP BY p_brand
ORDER BY p_brand
""",
    "q10_cross_join": """
SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name
""",
    "q11_asof_join": """
WITH ev AS (
  SELECT user_id AS k, date_trunc('second', ts) AS t, 0 AS side,
         event_id AS ord, value, NULL::BIGINT AS o_orderkey
  FROM events
), od AS (
  SELECT o_custkey % 20 AS k, o_orderdate AS t, 1 AS side,
         4611686018427387904 AS ord, NULL::DOUBLE AS value, o_orderkey
  FROM orders
), u AS (
  SELECT k, side,
         LAST_VALUE(value IGNORE NULLS) OVER (
           PARTITION BY k ORDER BY t, side, ord
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ev_value
  FROM (SELECT * FROM ev UNION ALL SELECT * FROM od)
)
SELECT k AS user_id, COUNT(*) AS n_orders, COUNT(ev_value) AS n_matched,
       ROUND(SUM(ev_value), 2) AS sum_value
FROM u WHERE side = 1
GROUP BY k
ORDER BY user_id
""",
    "q12_groupby_multi_agg": """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       ROUND(AVG(o_totalprice), 2) AS avg_price,
       ROUND(MIN(o_totalprice), 2) AS min_price,
       ROUND(MAX(o_totalprice), 2) AS max_price,
       ROUND(SUM(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    "q13_having": """
SELECT n_name, COUNT(*) AS n_cust
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
HAVING COUNT(*) > 5
ORDER BY n_name
""",
    "q68_scalar_subquery": """
SELECT c_custkey, ROUND(c_acctbal, 2) AS c_acctbal
FROM customer c
WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                   WHERE c2.c_nationkey = c.c_nationkey)
ORDER BY c_custkey
LIMIT 200
""",
    "q69_exists_subquery": """
SELECT s_suppkey, s_name,
       CAST(EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_suppkey = s.s_suppkey
                      AND l.l_quantity > 45) AS INT) AS has_big_shipment
FROM supplier s
WHERE EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_suppkey = s.s_suppkey)
ORDER BY s_suppkey
""",
    "q73_decimal_pricing": """
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
                * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2))))
            * 1000000 AS BIGINT) AS revenue_e6,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
}
