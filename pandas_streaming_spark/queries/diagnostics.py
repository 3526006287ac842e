"""Round-9 diagnostics & sketch-algebra entries split out of
`advanced` (module rebalance, the r6/r8 split convention): KMV distinct
sketch + set algebra, shuffle-key skew report, join-cardinality
prediction, RxC contingency deviations.

Same house rules and oracle discipline as the parent module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pandas_streaming_spark.catalog import load_table


def q214_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct sketch, k=64 — the third
    mergeable cardinality sketch next to HLL (q141) and bitmap (q163),
    and the one with a closed-form unbiased estimator: hash every
    member to a uniform fraction, keep the k smallest per group,
    estimate = (k-1)/h_k. The hash is md5's first 15 hex digits over
    16^15 (exact in a double's 53-bit mantissa, and computable verbatim
    in duckdb — the content-addressed determinism move again). Groups
    with < k members report their exact count (standard KMV fallback).
    Estimate graded alongside the exact distinct and the error in bp.
    Scale: the per-group top-k is a rank window over the DISTINCT
    member frame; a production form replaces the window with a
    map-side-combinable fixed-k min-heap UDAF, but the candidate frame
    is already |distinct members|, not |rows|."""
    k = 64
    scale = float(16**15)
    ev = load_table(spark, sf_dir, "events")
    members = ev.select("event_type", "user_id").distinct()
    h = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("double")
        / F.lit(scale)
    )
    w = Window.partitionBy("event_type").orderBy(F.col("__h").asc(), "user_id")
    ranked = members.withColumn("__h", h).withColumn(
        "__rn", F.row_number().over(w)
    )
    per = ranked.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_exact"),
        F.max(F.when(F.col("__rn") == k, F.col("__h"))).alias("__hk"),
    )
    est = F.when(
        F.col("__hk").isNotNull(),
        F.round(F.lit(float(k - 1)) / F.col("__hk"), 0).cast("long"),
    ).otherwise(F.col("n_exact"))
    return (
        per.select(
            "event_type",
            "n_exact",
            est.alias("kmv_est"),
        )
        .select(
            "event_type",
            "n_exact",
            "kmv_est",
            F.round(
                F.lit(1e4)
                * (F.col("kmv_est") - F.col("n_exact"))
                / F.col("n_exact"),
                0,
            )
            .cast("long")
            .alias("err_bp"),
        )
        .orderBy("event_type")
    )


def q220_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostics — the report an engineer runs BEFORE
    choosing a partitioning (the repo's own salting/AQE-skew machinery
    q88/q183 is the cure; this is the diagnosis): for each candidate
    key, the key cardinality, hottest key and its share (bp), and the
    Gini concentration in ppm computed from the rank formula
    G = (2·Σ i·c_i − (n+1)·Σc) / (n·Σc) over counts sorted (cnt, key) —
    every term an exact integer, so the grade has no float accumulation.
    Scale: each report is one map-side-combined groupBy to the key-count
    frame; the rank comes from the DISTRIBUTED global index
    (operators/indexing.global_index — VERDICT r9 item 3: the key-count
    frame grows with |keys|, so an unpartitioned rank window would
    single-task it), pins released after the unioned report
    materializes."""
    from pandas_streaming_spark.operators.indexing import global_index

    reports = []
    gis = []
    for label, tbl, colname in (
        ("events.user_id", "events", "user_id"),
        ("events.event_type", "events", "event_type"),
        ("orders.o_custkey", "orders", "o_custkey"),
    ):
        c = (
            load_table(spark, sf_dir, tbl)
            .groupBy(F.col(colname).cast("string").alias("k"))
            .agg(F.count("*").cast("long").alias("cnt"))
        )
        gi = global_index(c, ["cnt", "k"], "__i0")
        gis.append(gi)
        ranked = gi.df.withColumn("i", (F.col("__i0") + 1).cast("long"))
        agg = ranked.agg(
            F.count("*").cast("long").alias("n_keys"),
            F.sum("cnt").cast("long").alias("n_rows"),
            F.sum(F.col("i") * F.col("cnt")).cast("long").alias("__ws"),
            F.max("cnt").cast("long").alias("max_count"),
            F.min_by(
                "k", F.struct((-F.col("cnt")).alias("a"), F.col("k").alias("b"))
            ).alias("top_key"),
        )
        reports.append(
            agg.select(
                F.lit(label).alias("key_col"),
                "n_rows",
                "n_keys",
                "max_count",
                "top_key",
                F.round(F.lit(1e4) * F.col("max_count") / F.col("n_rows"), 0)
                .cast("long")
                .alias("max_share_bp"),
                F.round(
                    F.lit(1e6)
                    * (
                        2 * F.col("__ws")
                        - (F.col("n_keys") + 1) * F.col("n_rows")
                    )
                    / (F.col("n_keys") * F.col("n_rows")),
                    0,
                )
                .cast("long")
                .alias("gini_ppm"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    out = out.orderBy("key_col").localCheckpoint(eager=True)
    for gi in gis:
        gi.release()
    return out


def q221_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch SET ALGEBRA — the theta-sketch use case q156 covers
    for HLL, on the k-minimum-values sketch (q214): click-audience and
    buy-audience sketches (parity-cut memberships — see below), union
    estimated from the k smallest hashes
    of the union, intersection via the standard KMV rho-rule (the
    fraction of the union's k-sample present in BOTH sets scales the
    union estimate — Beyer et al. 2007). Every hash is the q214
    md5-fraction, so the duckdb oracle reproduces the sketches
    verbatim; exact counts ride along as the audit. Scale: one distinct
    per-user flag aggregate; each sketch's k-smallest extraction is the
    salted TWO-PHASE cut (the q86 knn_join shape — per-salt rank, wide;
    then the global rank window runs over ≤ n_salts·k surviving rows, a
    CONSTANT-size frame, never |users|; VERDICT r9 item 3). Any row
    with global rank ≤ k also ranks ≤ k within its own salt group, so
    the cut is lossless."""
    k = 64
    scale = float(16**15)
    ev = load_table(spark, sf_dir, "events")
    flags = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("user_id")
        .agg(
            # parity-defined audiences: every user has every event type
            # at this fixture's density, so membership flags must cut
            # INSIDE the counts to stay ~50/50 at any SF (odd click
            # count / odd purchase count — deterministic, scale-stable)
            (F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
             % 2).cast("int").alias("in_a"),
            (F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
             % 2).cast("int").alias("in_b"),
        )
        .filter((F.col("in_a") == 1) | (F.col("in_b") == 1))
        .withColumn(
            "hf",
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
                16,
                10,
            ).cast("double")
            / F.lit(scale),
        )
    ).localCheckpoint(eager=False)

    def est(df: DataFrame, label: str) -> DataFrame:
        w1 = Window.partitionBy("__s").orderBy(F.col("hf").asc(), "user_id")
        cand = (
            df.withColumn("__s", F.pmod(F.hash("user_id"), F.lit(16)))
            .withColumn("__r1", F.row_number().over(w1))
            .filter(F.col("__r1") <= k)
        )
        # global rank over the ≤ 16·k phase-1 survivors only
        w2 = Window.orderBy(F.col("hf").asc(), "user_id")
        r = cand.withColumn("__rn", F.row_number().over(w2))
        topagg = r.agg(
            F.max(F.when(F.col("__rn") == k, F.col("hf"))).alias("__hk"),
            F.sum(
                F.when(
                    (F.col("__rn") <= k)
                    & (F.col("in_a") == 1)
                    & (F.col("in_b") == 1),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("__m"),
        )
        nagg = df.agg(F.count("*").cast("long").alias("n_exact"))
        return nagg.join(F.broadcast(topagg)).select(
            F.lit(label).alias("audience"),
            "n_exact",
            F.when(
                F.col("__hk").isNotNull(),
                F.round(F.lit(float(k - 1)) / F.col("__hk"), 0).cast("long"),
            )
            .otherwise(F.col("n_exact"))
            .alias("kmv_est"),
            F.col("__m").alias("k_both"),
        )

    a = est(flags.filter(F.col("in_a") == 1), "click")
    b = est(flags.filter(F.col("in_b") == 1), "purchase")
    u = est(flags, "union")
    inter = u.select(
        F.lit("intersection").alias("audience"),
        F.lit(None).cast("long").alias("n_exact"),
        # rho-rule denominator is the ACTUAL union sample size — the
        # sketch holds min(k, n) members on the exact-count fallback
        # path, and dividing by a fixed k biases small audiences low
        # (ADVICE r9)
        F.round(
            F.col("k_both")
            * F.col("kmv_est")
            / F.least(F.lit(float(k)), F.col("n_exact").cast("double")),
            0,
        )
        .cast("long")
        .alias("kmv_est"),
        F.col("k_both"),
    )
    inter_exact = flags.filter(
        (F.col("in_a") == 1) & (F.col("in_b") == 1)
    ).agg(F.count("*").cast("long").alias("__n"))
    inter = inter.join(F.broadcast(inter_exact)).select(
        "audience", F.col("__n").alias("n_exact"), "kmv_est", "k_both"
    )
    return a.unionByName(b).unionByName(u).unionByName(inter).orderBy(
        "audience"
    )


def q223_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-output cardinality prediction from per-key histograms — the
    pre-join planning question ("will this M:N join explode?") answered
    exactly: |A ⋈ B| = Σ_k c_A(k)·c_B(k). Demonstrated on the genuinely
    many-to-many click×purchase self-join per user; graded as the top-5
    contributing keys plus a __TOTAL__ row where the prediction sits
    beside the ACTUAL joined count — they must be equal (the identity
    is the self-check). Scale: two map-side-combined count aggregates +
    a key-frame join; the histogram frames are |keys|-sized, so the
    prediction costs nothing compared to running the join blind."""
    ev = load_table(spark, sf_dir, "events")
    ca = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("c_click"))
    )
    cb = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("c_purchase"))
    )
    contrib = ca.join(cb, "user_id").select(
        F.col("user_id").cast("string").alias("key"),
        "c_click",
        "c_purchase",
        (F.col("c_click") * F.col("c_purchase")).cast("long").alias("contrib"),
    )
    top5 = (
        contrib.orderBy(F.col("contrib").desc(), "key")
        .limit(5)
        .withColumn("actual_rows", F.lit(None).cast("long"))
    )
    a = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("__ea")
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("__eb")
    )
    actual = a.join(b, "user_id").agg(
        F.count("*").cast("long").alias("actual_rows")
    )
    total = (
        contrib.agg(
            F.sum("c_click").cast("long").alias("c_click"),
            F.sum("c_purchase").cast("long").alias("c_purchase"),
            F.sum("contrib").cast("long").alias("contrib"),
        )
        .join(F.broadcast(actual))
        .select(
            F.lit("__TOTAL__").alias("key"),
            "c_click",
            "c_purchase",
            "contrib",
            "actual_rows",
        )
    )
    return top5.unionByName(total).orderBy(
        F.col("key") == "__TOTAL__", F.col("contrib").desc(), "key"
    )


def q225_contingency_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R×C contingency-table independence deviations (the general form
    of q206's 2-arm SRM gate): event_type × md5-assigned 3-arm split,
    each cell graded as the EXACT integer deviation |O·N − R·C| beside
    its observed/marginal counts — the chi-square numerator per cell
    without squaring (|dev| stays inside int64 at any SF where O·N
    does; the squared form overflows at ~1e9-row tables). No float
    anywhere in the grade. Scale: one counts aggregate + two tiny
    marginal frames broadcast back onto the |R·C| cell frame."""
    ev = load_table(spark, sf_dir, "events")
    cells = (
        ev.select(
            "event_type",
            F.pmod(
                F.conv(
                    F.substring(F.md5(F.col("user_id").cast("string")), 1, 7),
                    16,
                    10,
                ).cast("long"),
                F.lit(3),
            ).alias("arm"),
        )
        .groupBy("event_type", "arm")
        .agg(F.count("*").cast("long").alias("observed"))
    )
    rt = cells.groupBy("event_type").agg(F.sum("observed").alias("r_tot"))
    ct = cells.groupBy("arm").agg(F.sum("observed").alias("c_tot"))
    n = cells.agg(F.sum("observed").alias("n_tot"))
    return (
        cells.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "arm")
        .join(F.broadcast(n))
        .select(
            "event_type",
            F.col("arm").cast("long").alias("arm"),
            "observed",
            F.col("r_tot").cast("long").alias("r_tot"),
            F.col("c_tot").cast("long").alias("c_tot"),
            F.col("n_tot").cast("long").alias("n_tot"),
            F.abs(
                F.col("observed") * F.col("n_tot")
                - F.col("r_tot") * F.col("c_tot")
            )
            .cast("long")
            .alias("dev"),
        )
        .orderBy("event_type", "arm")
    )



def q243_sampled_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from a DETERMINISTIC bottom-k hash sample —
    the mergeable quantile-sketch companion to the KMV distinct sketch
    (q214): per order priority keep the 256 rows with the smallest
    md5-fraction of the key (a uniform content-addressed sample any
    engine re-derives), estimate the discrete median/p90 from the
    sample, and grade the estimate BESIDE the exact q157-style
    percentile with the signed error in bp. The scale story: the exact
    per-group percentile needs every row through a per-group sort;
    the bottom-k sample is extracted with the salted two-phase cut
    (per-(group, salt) rank first — wide; the per-group rank then runs
    over ≤ 16·256 surviving rows), after which quantile work is
    sample-sized. At 100 TB you ship the sample estimate; the exact
    column here is the fixture-scale audit that MEASURES what the
    sample costs in accuracy (the honest sketch-grading move of
    q214/q238)."""
    k = 256
    scale = float(16**15)
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        "o_orderkey",
    )
    hf = (
        F.conv(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 15), 16, 10
        ).cast("double")
        / F.lit(scale)
    )
    salted = o.withColumn("__hf", hf).withColumn(
        "__s", F.pmod(F.hash("o_orderkey"), F.lit(16))
    )
    w1 = Window.partitionBy("grp", "__s").orderBy("__hf", "o_orderkey")
    cand = salted.withColumn("__r1", F.row_number().over(w1)).filter(
        F.col("__r1") <= k
    )
    w2 = Window.partitionBy("grp").orderBy("__hf", "o_orderkey")
    samp = cand.withColumn("__rn", F.row_number().over(w2)).filter(
        F.col("__rn") <= k
    )
    wcd_s = Window.partitionBy("grp").orderBy("cents")
    est = (
        samp.select("grp", "cents", F.cume_dist().over(wcd_s).alias("cd"))
        .groupBy("grp")
        .agg(
            F.count("*").cast("long").alias("n_sample"),
            F.min(F.when(F.col("cd") >= 0.5, F.col("cents"))).alias("est_p50"),
            F.min(F.when(F.col("cd") >= 0.9, F.col("cents"))).alias("est_p90"),
        )
    )
    wcd = Window.partitionBy("grp").orderBy("cents")
    exact = (
        o.select("grp", "cents", F.cume_dist().over(wcd).alias("cd"))
        .groupBy("grp")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min(F.when(F.col("cd") >= 0.5, F.col("cents"))).alias("exact_p50"),
            F.min(F.when(F.col("cd") >= 0.9, F.col("cents"))).alias("exact_p90"),
        )
    )
    err = lambda e, x: (  # noqa: E731 - signed error in bp
        F.round(F.lit(1e4) * (F.col(e) - F.col(x)) / F.col(x), 0).cast("long")
    )
    return (
        exact.join(est, "grp")
        .select(
            "grp",
            "n_rows",
            "n_sample",
            "est_p50",
            "exact_p50",
            err("est_p50", "exact_p50").alias("err_p50_bp"),
            "est_p90",
            "exact_p90",
            err("est_p90", "exact_p90").alias("err_p90_bp"),
        )
        .orderBy("grp")
    )


#: Poisson(1) CDF thresholds for the inverse-CDF bootstrap weights —
#: exact decimal literals injected into BOTH engines' SQL/exprs, so the
#: u < c comparisons are bit-identical (math.exp at build time would be
#: the same doubles, but literals make the contract visible)
_POIS_CDF = (
    "0.36787944117144233",  # P(X <= 0)
    "0.7357588823428847",   # P(X <= 1)
    "0.9196986029286058",   # P(X <= 2)
    "0.9810118431238462",   # P(X <= 3)
    "0.9963401531726563",   # P(X <= 4)
)


def q254_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap of the mean — THE resampling scheme for
    confidence intervals on datasets too large to index (each row gets
    an independent Poisson(1) replication weight per resample, so no
    pass needs to know n — the estimator large-scale experimentation
    platforms actually run): 32 resamples of mean order value, each
    row's weight drawn by inverse-CDF over the md5 fraction of
    (o_orderkey, b) — content-addressed, so both engines draw the
    IDENTICAL weights and the 'random' bootstrap is exactly gradable.
    Weights capped at 5 (P > 0.9963 tail). Graded per resample:
    effective row count Σw and the resampled mean in cents (rounded
    ratio of exact integer sums) — the spread across the 32 rows IS the
    CI readout. Scale: one 32× explode + one map-side-combined
    aggregate; no global state, no sort."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    b = o.select(
        "o_orderkey",
        "cents",
        F.explode(F.sequence(F.lit(1), F.lit(32))).alias("b"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("o_orderkey").cast("string"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(16**15))
    )
    c = [F.lit(float(x)) for x in _POIS_CDF]
    w = (
        F.when(u < c[0], 0)
        .when(u < c[1], 1)
        .when(u < c[2], 2)
        .when(u < c[3], 3)
        .when(u < c[4], 4)
        .otherwise(5)
        .cast("long")
    )
    return (
        b.select("b", "cents", w.alias("w"))
        .groupBy("b")
        .agg(
            F.sum("w").cast("long").alias("n_eff"),
            F.round(F.sum(F.col("w") * F.col("cents")) / F.sum("w"), 0)
            .cast("long")
            .alias("mean_cents"),
        )
        .orderBy("b")
    )


def q255_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction — the experimentation-platform
    adjustment (Deng et al. 2013): shrink each arm's post-period mean
    by θ·(pre-period mean − global pre mean), θ = cov(pre, post) /
    var(pre) pooled across arms. Per user: pre/post purchase cents
    split at the corpus time midpoint (an integer µs from one broadcast
    min/max aggregate); arms by md5 parity (content-addressed).
    Moments ride as EXACT integer sums (n, Σx, Σy, Σx², Σxy) and θ and
    the adjusted means are derived from them with one identical double
    expression on both engines; outputs use the q72 floor(x·100 + 0.5)
    half-up policy so the final compare is integer. Graded per arm:
    users, raw post mean, pre mean, adjusted post mean (all cents).
    Scale: two map-side-combined aggregates over one events scan; the
    moment frame is 1 row; the arm frame is 2 rows."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    base = ev.select(
        "user_id",
        F.unix_micros("ts").alias("uts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    # floor on both engines: CAST(double AS BIGINT) truncates in Spark
    # but banker-rounds in duckdb — FLOOR is the one shared semantic
    mid = base.agg(
        F.floor((F.min("uts") + F.max("uts")) / 2).cast("long").alias("__mid")
    )
    per = (
        base.join(F.broadcast(mid))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("uts") <= F.col("__mid"), F.col("cents")).otherwise(0))
            .cast("long")
            .alias("x"),
            F.sum(F.when(F.col("uts") > F.col("__mid"), F.col("cents")).otherwise(0))
            .cast("long")
            .alias("y"),
        )
        .withColumn(
            "arm",
            F.pmod(
                F.conv(
                    F.substring(F.md5(F.col("user_id").cast("string")), 1, 7),
                    16,
                    10,
                ).cast("long"),
                F.lit(2),
            ).cast("long"),
        )
        .localCheckpoint(eager=False)
    )
    mom = per.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    theta = (
        F.col("n").cast("double") * F.col("sxy")
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.col("n").cast("double") * F.col("sxx")
        - F.col("sx").cast("double") * F.col("sx")
    )
    arms = per.groupBy("arm").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("x").cast("long").alias("ax"),
        F.sum("y").cast("long").alias("ay"),
    )
    mean_pre = F.col("ax").cast("double") / F.col("n_users")
    mean_post = F.col("ay").cast("double") / F.col("n_users")
    global_pre = F.col("sx").cast("double") / F.col("n")
    adj = mean_post - theta * (mean_pre - global_pre)
    half_up = lambda col: F.floor(col + F.lit(0.5)).cast("long")  # noqa: E731
    return (
        arms.join(F.broadcast(mom))
        .select(
            "arm",
            "n_users",
            half_up(mean_post).alias("mean_post_cents"),
            half_up(mean_pre).alias("mean_pre_cents"),
            half_up(adj).alias("adj_post_cents"),
        )
        .orderBy("arm")
    )


_SKEW_ONE = """
SELECT '{label}' AS key_col,
       CAST(SUM(cnt) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(MAX(cnt) AS BIGINT) AS max_count,
       (SELECT k FROM (
          SELECT CAST({col} AS VARCHAR) AS k, COUNT(*) AS c
          FROM {tbl} GROUP BY 1
        ) ORDER BY c DESC, k LIMIT 1) AS top_key,
       CAST(ROUND(1e4 * MAX(cnt) / SUM(cnt), 0) AS BIGINT) AS max_share_bp,
       CAST(ROUND(1e6 * (2 * SUM(i * cnt) - (COUNT(*) + 1) * SUM(cnt))
                  / (COUNT(*) * SUM(cnt)), 0) AS BIGINT) AS gini_ppm
FROM (
  SELECT k, cnt, CAST(ROW_NUMBER() OVER (ORDER BY cnt, k) AS BIGINT) AS i
  FROM (
    SELECT CAST({col} AS VARCHAR) AS k, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM {tbl} GROUP BY 1
  )
)
"""

_KMV_FLAGS = """
flags AS (
  SELECT * FROM (
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) % 2
                AS INT) AS in_a,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) % 2
                AS INT) AS in_b,
           CAST(CONCAT('0x', SUBSTR(MD5(CAST(user_id AS VARCHAR)), 1, 15))
                AS BIGINT) / 1152921504606846976.0 AS hf
    FROM events WHERE event_type IN ('click', 'purchase')
    GROUP BY user_id
  ) WHERE in_a = 1 OR in_b = 1
)
"""

_KMV_EST = """
SELECT '{label}' AS audience,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       CASE WHEN MAX(CASE WHEN rn = 64 THEN hf END) IS NOT NULL
            THEN CAST(ROUND(63.0 / MAX(CASE WHEN rn = 64 THEN hf END), 0)
                      AS BIGINT)
            ELSE CAST(COUNT(*) AS BIGINT) END AS kmv_est,
       CAST(SUM(CASE WHEN rn <= 64 AND in_a = 1 AND in_b = 1
                THEN 1 ELSE 0 END) AS BIGINT) AS k_both
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY hf, user_id) AS rn
      FROM flags WHERE {where})
"""


def q270_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift check on BINNED CDFs — the
    distribution-shift alarm (complementing q194's total-variation drift
    on categoricals) an experimentation/data-quality platform runs
    between cohorts: orders split by o_orderkey parity, order value in
    cents binned at 500-dollar width, D = sup |F_a − F_b| over bin
    edges. The sup comparison is EXACT integer cross-multiplication
    (|cumA·N_b − cumB·N_a|, no float until the final e6 readout), and
    binning bounds the CDF frame to ~hundreds of rows at ANY corpus
    size — the scale-honest form (an exact KS over raw values needs a
    global sort of all distinct values; production monitoring bins
    first, paying a ≤ bin-width resolution loss). Graded: one row —
    sizes, bins, the exact D numerator, KS in e6, and the bin where the
    sup is attained (smallest such bin)."""
    o = load_table(spark, sf_dir, "orders").select(
        F.pmod("o_orderkey", F.lit(2)).cast("long").alias("side"),
        F.floor(
            F.round(F.col("o_totalprice") * 100, 0).cast("long") / 50000
        )
        .cast("long")
        .alias("bin"),
    )
    counts = o.groupBy("bin").agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).cast("long").alias("ca"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).cast("long").alias("cb"),
    )
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = counts.select(
        "bin",
        F.sum("ca").over(w).alias("cuma"),
        F.sum("cb").over(w).alias("cumb"),
    )
    tot = counts.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
        F.count("*").cast("long").alias("n_bins"),
    )
    dev = cum.join(F.broadcast(tot)).select(
        "bin",
        "na",
        "nb",
        "n_bins",
        F.abs(F.col("cuma") * F.col("nb") - F.col("cumb") * F.col("na"))
        .cast("long")
        .alias("d"),
    )
    dev = dev.localCheckpoint(eager=False)  # argmax re-reads the frame
    return (
        dev.join(F.broadcast(dev.agg(F.max("d").alias("__mx"))))
        .filter(F.col("d") == F.col("__mx"))
        .groupBy("na", "nb", "n_bins")
        .agg(
            F.max("d").cast("long").alias("d_num"),
            F.min("bin").cast("long").alias("bin_at_max"),
        )
        .select(
            "na",
            "nb",
            "n_bins",
            "d_num",
            F.round(F.lit(1e6) * F.col("d_num") / (F.col("na") * F.col("nb")), 0)
            .cast("long")
            .alias("ks_e6"),
            "bin_at_max",
        )
    )


def q293_spearman_length_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPEARMAN rank correlation between document length and distinct
    vocabulary, per source — the robust (rank-based) companion to the
    Pearson family (q130): a source whose length↔diversity rank
    correlation is LOW relative to its peers is template/boilerplate
    suspect (length grows without new types — the q89 repetition signal
    at corpus granularity, in a scale-free statistic). Ranks are
    tie-AVERAGED in doubled integer units (2·avg_rank = 2·RANK() +
    tie_count − 1 — exact longs, no float until the final ratio), then
    ρ = Pearson over the integer rank pairs with exact int64 sums; the
    only floats are one sqrt and one divide over exactly-representable
    operands (< 2^53), rounded at e4 — the q181 bounded-divergence
    argument. Degenerate sources (all lengths tied) report 0. Scale:
    two rank windows partitioned BY SOURCE (each source sorts its own
    rows — no global sort), one map-side-combined moment aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.select(
        "source",
        F.col("doc_id"),
        F.size(F.split("text", " ")).cast("long").alias("__x"),
        F.size(F.array_distinct(F.split("text", " "))).cast("long").alias("__y"),
    )
    wx = Window.partitionBy("source").orderBy("__x")
    wxt = Window.partitionBy("source", "__x")
    wy = Window.partitionBy("source").orderBy("__y")
    wyt = Window.partitionBy("source", "__y")
    ranked = per.select(
        "source",
        (F.lit(2) * F.rank().over(wx) + F.count("*").over(wxt) - 1)
        .cast("long")
        .alias("__rx"),
        (F.lit(2) * F.rank().over(wy) + F.count("*").over(wyt) - 1)
        .cast("long")
        .alias("__ry"),
    )
    mom = ranked.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("__rx").cast("long").alias("__sx"),
        F.sum("__ry").cast("long").alias("__sy"),
        F.sum(F.col("__rx") * F.col("__rx")).cast("long").alias("__sxx"),
        F.sum(F.col("__ry") * F.col("__ry")).cast("long").alias("__syy"),
        F.sum(F.col("__rx") * F.col("__ry")).cast("long").alias("__sxy"),
    )
    num = (F.col("n_docs") * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast(
        "double"
    )
    den = F.sqrt(
        (F.col("n_docs") * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast(
            "double"
        )
        * (F.col("n_docs") * F.col("__syy") - F.col("__sy") * F.col("__sy")).cast(
            "double"
        )
    )
    return (
        mom.select(
            "source",
            "n_docs",
            F.when(den == 0, F.lit(0))
            .otherwise(F.round(F.lit(1e4) * num / den, 0))
            .cast("long")
            .alias("rho_e4"),
        )
        .orderBy("source")
    )


QUERIES = {
    "q293_spearman_length_diversity": q293_spearman_length_diversity,
    "q243_sampled_quantiles": q243_sampled_quantiles,
    "q270_ks_drift": q270_ks_drift,
    "q254_poisson_bootstrap": q254_poisson_bootstrap,
    "q255_cuped_adjustment": q255_cuped_adjustment,
    "q214_kmv_distinct": q214_kmv_distinct,
    "q220_skew_report": q220_skew_report,
    "q221_kmv_set_ops": q221_kmv_set_ops,
    "q223_join_cardinality": q223_join_cardinality,
    "q225_contingency_deviation": q225_contingency_deviation,
}

ORACLES = {
    # tie-averaged doubled integer ranks, exact int64 moments, one
    # sqrt+divide at e4
    "q293_spearman_length_diversity": """
WITH per AS (
  SELECT source, doc_id,
         CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS x,
         CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS BIGINT) AS y
  FROM documents
),
ranked AS (
  SELECT source,
         CAST(2 * RANK() OVER (PARTITION BY source ORDER BY x)
              + COUNT(*) OVER (PARTITION BY source, x) - 1 AS BIGINT) AS rx,
         CAST(2 * RANK() OVER (PARTITION BY source ORDER BY y)
              + COUNT(*) OVER (PARTITION BY source, y) - 1 AS BIGINT) AS ry
  FROM per
),
mom AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(rx) AS BIGINT) AS sx, CAST(SUM(ry) AS BIGINT) AS sy,
         CAST(SUM(rx * rx) AS BIGINT) AS sxx,
         CAST(SUM(ry * ry) AS BIGINT) AS syy,
         CAST(SUM(rx * ry) AS BIGINT) AS sxy
  FROM ranked GROUP BY source
)
SELECT source, n_docs,
       CASE WHEN (n_docs * sxx - sx * sx) * (n_docs * syy - sy * sy) = 0
            THEN 0
            ELSE CAST(ROUND(1e4 * (n_docs * sxy - sx * sy)
                            / SQRT(CAST(n_docs * sxx - sx * sx AS DOUBLE)
                                   * CAST(n_docs * syy - sy * sy AS DOUBLE)),
                            0) AS BIGINT)
       END AS rho_e4
FROM mom ORDER BY source
""",
    # same 500-dollar bins, cumulative counts, exact cross-multiplied sup
    "q270_ks_drift": """
WITH o AS (
  SELECT CAST(o_orderkey % 2 AS BIGINT) AS side,
         CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) // 50000
              AS BIGINT) AS bin
  FROM orders
),
counts AS (
  SELECT bin,
         SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS cb
  FROM o GROUP BY bin
),
cum AS (
  SELECT bin,
         SUM(ca) OVER (ORDER BY bin
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
         SUM(cb) OVER (ORDER BY bin
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb
  FROM counts
),
tot AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
         CAST(COUNT(*) AS BIGINT) AS n_bins
  FROM counts
),
dev AS (
  SELECT bin, na, nb, n_bins,
         CAST(ABS(cuma * nb - cumb * na) AS BIGINT) AS d
  FROM cum, tot
),
mx AS (SELECT MAX(d) AS m FROM dev)
SELECT na, nb, n_bins,
       CAST(MAX(d) AS BIGINT) AS d_num,
       CAST(ROUND(1e6 * MAX(d) / (na * nb), 0) AS BIGINT) AS ks_e6,
       CAST(MIN(bin) AS BIGINT) AS bin_at_max
FROM dev, mx WHERE d = mx.m
GROUP BY na, nb, n_bins
""",
    # identical md5-fraction draws, identical Poisson CDF literals
    "q254_poisson_bootstrap": """
WITH b AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
         UNNEST(GENERATE_SERIES(1, 32)) AS b
  FROM orders
),
w AS (
  SELECT b, cents,
         CAST(CASE WHEN u < 0.36787944117144233 THEN 0
                   WHEN u < 0.7357588823428847 THEN 1
                   WHEN u < 0.9196986029286058 THEN 2
                   WHEN u < 0.9810118431238462 THEN 3
                   WHEN u < 0.9963401531726563 THEN 4
                   ELSE 5 END AS BIGINT) AS w
  FROM (
    SELECT b, cents,
           CAST(CONCAT('0x', SUBSTR(MD5(CAST(o_orderkey AS VARCHAR) || ':'
                || CAST(b AS VARCHAR)), 1, 15)) AS BIGINT)
             / 1152921504606846976.0 AS u
    FROM b
  )
)
SELECT CAST(b AS BIGINT) AS b,
       CAST(SUM(w) AS BIGINT) AS n_eff,
       CAST(ROUND(CAST(SUM(w * cents) AS DOUBLE) / SUM(w), 0) AS BIGINT)
         AS mean_cents
FROM w GROUP BY b ORDER BY b
""",
    # same midpoint split, md5-parity arms, exact moment sums, one
    # shared double theta expression, floor(x+0.5) outputs
    "q255_cuped_adjustment": """
WITH base AS (
  SELECT user_id, EPOCH_US(ts) AS uts,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
mid AS (
  SELECT CAST(FLOOR((MIN(uts) + MAX(uts)) / 2.0) AS BIGINT) AS m FROM base
),
per AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN uts <= (SELECT m FROM mid) THEN cents
                  ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN uts > (SELECT m FROM mid) THEN cents
                  ELSE 0 END) AS BIGINT) AS y,
         CAST(CONCAT('0x', SUBSTR(MD5(CAST(user_id AS VARCHAR)), 1, 7))
              AS BIGINT) % 2 AS arm
  FROM base GROUP BY user_id
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM per
),
arms AS (
  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(x) AS BIGINT) AS ax, CAST(SUM(y) AS BIGINT) AS ay
  FROM per GROUP BY arm
)
SELECT CAST(arm AS BIGINT) AS arm, n_users,
       CAST(FLOOR(CAST(ay AS DOUBLE) / n_users + 0.5) AS BIGINT)
         AS mean_post_cents,
       CAST(FLOOR(CAST(ax AS DOUBLE) / n_users + 0.5) AS BIGINT)
         AS mean_pre_cents,
       CAST(FLOOR(
         CAST(ay AS DOUBLE) / n_users
         - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
            / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
           * (CAST(ax AS DOUBLE) / n_users - CAST(sx AS DOUBLE) / n)
         + 0.5) AS BIGINT) AS adj_post_cents
FROM arms CROSS JOIN mom
ORDER BY arm
""",
    # same md5 bottom-256 sample, same cume_dist >= p discrete rule
    "q243_sampled_quantiles": """
WITH o AS (
  SELECT o_orderpriority AS grp,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
         o_orderkey,
         CAST(CONCAT('0x', SUBSTR(MD5(CAST(o_orderkey AS VARCHAR)), 1, 15))
              AS BIGINT) / 1152921504606846976.0 AS hf
  FROM orders
),
samp AS (
  SELECT grp, cents
  FROM (SELECT grp, cents,
               ROW_NUMBER() OVER (PARTITION BY grp
                                  ORDER BY hf, o_orderkey) AS rn
        FROM o)
  WHERE rn <= 256
),
est AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_sample,
         MIN(CASE WHEN cd >= 0.5 THEN cents END) AS est_p50,
         MIN(CASE WHEN cd >= 0.9 THEN cents END) AS est_p90
  FROM (SELECT grp, cents,
               CUME_DIST() OVER (PARTITION BY grp ORDER BY cents) AS cd
        FROM samp)
  GROUP BY grp
),
exact AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_rows,
         MIN(CASE WHEN cd >= 0.5 THEN cents END) AS exact_p50,
         MIN(CASE WHEN cd >= 0.9 THEN cents END) AS exact_p90
  FROM (SELECT grp, cents,
               CUME_DIST() OVER (PARTITION BY grp ORDER BY cents) AS cd
        FROM o)
  GROUP BY grp
)
SELECT grp, n_rows, n_sample,
       est_p50, exact_p50,
       CAST(ROUND(1e4 * (est_p50 - exact_p50) / exact_p50, 0) AS BIGINT)
         AS err_p50_bp,
       est_p90, exact_p90,
       CAST(ROUND(1e4 * (est_p90 - exact_p90) / exact_p90, 0) AS BIGINT)
         AS err_p90_bp
FROM exact JOIN est USING (grp)
ORDER BY grp
""",
    # histogram-product identity: predicted == actual joined count
    "q223_join_cardinality": """
WITH ca AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c_click
  FROM events WHERE event_type = 'click' GROUP BY user_id
), cb AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c_purchase
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
), contrib AS (
  SELECT CAST(ca.user_id AS VARCHAR) AS key, c_click, c_purchase,
         CAST(c_click * c_purchase AS BIGINT) AS contrib
  FROM ca JOIN cb USING (user_id)
), top5 AS (
  SELECT key, c_click, c_purchase, contrib,
         CAST(NULL AS BIGINT) AS actual_rows
  FROM contrib ORDER BY contrib DESC, key LIMIT 5
), actual AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS actual_rows
  FROM (SELECT user_id FROM events WHERE event_type = 'click') a
  JOIN (SELECT user_id FROM events WHERE event_type = 'purchase') b
    USING (user_id)
), total AS (
  SELECT '__TOTAL__' AS key,
         CAST(SUM(c_click) AS BIGINT) AS c_click,
         CAST(SUM(c_purchase) AS BIGINT) AS c_purchase,
         CAST(SUM(contrib) AS BIGINT) AS contrib,
         (SELECT actual_rows FROM actual) AS actual_rows
  FROM contrib
)
SELECT * FROM (
  SELECT * FROM top5 UNION ALL SELECT * FROM total
) ORDER BY key = '__TOTAL__', contrib DESC, key
""",
    # same md5 3-arm assignment; |O*N - R*C| exact per cell
    "q225_contingency_deviation": """
WITH cells AS (
  SELECT event_type,
         CAST(CONCAT('0x', SUBSTR(MD5(CAST(user_id AS VARCHAR)), 1, 7))
              AS BIGINT) % 3 AS arm,
         CAST(COUNT(*) AS BIGINT) AS observed
  FROM events GROUP BY 1, 2
), rt AS (SELECT event_type, CAST(SUM(observed) AS BIGINT) AS r_tot
          FROM cells GROUP BY event_type),
ct AS (SELECT arm, CAST(SUM(observed) AS BIGINT) AS c_tot
       FROM cells GROUP BY arm),
n AS (SELECT CAST(SUM(observed) AS BIGINT) AS n_tot FROM cells)
SELECT c.event_type, CAST(c.arm AS BIGINT) AS arm, c.observed,
       rt.r_tot, ct.c_tot, n.n_tot,
       CAST(ABS(c.observed * n.n_tot - rt.r_tot * ct.c_tot) AS BIGINT)
         AS dev
FROM cells c JOIN rt USING (event_type) JOIN ct USING (arm) CROSS JOIN n
ORDER BY event_type, arm
""",
    # same md5-fraction sketches; intersection via the KMV rho-rule
    "q221_kmv_set_ops": (
        "WITH "
        + _KMV_FLAGS
        + ", eu AS ("
        + _KMV_EST.format(label="union", where="1=1")
        + ") SELECT * FROM ("
        + _KMV_EST.format(label="click", where="in_a = 1")
        + " UNION ALL "
        + _KMV_EST.format(label="purchase", where="in_b = 1")
        + " UNION ALL SELECT * FROM eu"
        + """ UNION ALL
SELECT 'intersection',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM flags
        WHERE in_a = 1 AND in_b = 1),
       -- rho-rule over the ACTUAL union sample size min(k, n_exact),
       -- matching the engine (ADVICE r9)
       CAST(ROUND(eu.k_both * eu.kmv_est
                  / LEAST(64.0, CAST(eu.n_exact AS DOUBLE)), 0) AS BIGINT),
       eu.k_both
FROM eu
) ORDER BY audience"""
    ),
    # identical rank-formula Gini over (cnt, key)-sorted key counts
    "q220_skew_report": (
        _SKEW_ONE.format(label="events.event_type", col="event_type", tbl="events")
        + " UNION ALL "
        + _SKEW_ONE.format(label="events.user_id", col="user_id", tbl="events")
        + " UNION ALL "
        + _SKEW_ONE.format(label="orders.o_custkey", col="o_custkey", tbl="orders")
        + " ORDER BY key_col"
    ),
    # identical md5-fraction hash, rank window, (k-1)/h_k estimator
    "q214_kmv_distinct": """
WITH members AS (
  SELECT DISTINCT event_type, user_id FROM events
), h AS (
  SELECT event_type, user_id,
         CAST(CONCAT('0x', SUBSTR(MD5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) / 1152921504606846976.0 AS hf
  FROM members
), r AS (
  SELECT event_type, hf,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY hf, user_id) AS rn
  FROM h
), per AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_exact,
         MAX(CASE WHEN rn = 64 THEN hf END) AS hk
  FROM r GROUP BY event_type
), e AS (
  SELECT event_type, n_exact,
         CASE WHEN hk IS NOT NULL
              THEN CAST(ROUND(63.0 / hk, 0) AS BIGINT)
              ELSE n_exact END AS kmv_est
  FROM per
)
SELECT event_type, n_exact, kmv_est,
       CAST(ROUND(1e4 * (kmv_est - n_exact) / n_exact, 0) AS BIGINT)
         AS err_bp
FROM e ORDER BY event_type
""",
}
