"""Data-quality / table-audit queries (round 7): declarative
constraint checking — the dbt-test / Great-Expectations surface a
warehouse team runs nightly over every table, re-expressed as single
Spark jobs. (Column profiling already lives at q106_column_profile.)

House rules: same oracle discipline as every other module (aliases match
the duckdb SQL exactly; numeric outputs either exact integers or doubles
produced by identical arithmetic on both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_streaming_spark.catalog import load_table
from pandas_streaming_spark.functions import hb_sql
from pandas_streaming_spark.operators.text import max_token_multiplicity


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def q177_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint audit (§2.9 data-quality family): the four
    dbt-test archetypes as one summary frame — ``unique`` (duplicate
    o_orderkey rows), ``not_null``/``accepted_range`` (o_totalprice NULL
    or <= 0), ``accepted_values`` (o_orderpriority outside its domain),
    ``referential`` (lineitem rows whose l_orderkey has no parent
    order). Scale shape: the single-table checks are one hash aggregate
    each over a shared scan; the FK check is a LEFT ANTI join that AQE
    turns into a broadcast when the parent's key set fits, otherwise a
    shuffled hash join on the key — never a cartesian. Each check emits
    (check_name, n_violations, n_checked); a clean table grades as
    all-zero violations, which IS the assertion."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")

    uniq = (
        o.groupBy("o_orderkey")
        .agg(F.count("*").alias("__n"))
        .agg(
            F.lit("unique_o_orderkey").alias("check_name"),
            F.coalesce(F.sum(F.when(F.col("__n") > 1, F.col("__n"))), F.lit(0))
            .cast("long")
            .alias("n_violations"),
            F.sum("__n").cast("long").alias("n_checked"),
        )
    )
    rng = o.agg(
        F.lit("totalprice_positive").alias("check_name"),
        F.sum(
            F.when(
                F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_violations"),
        F.count("*").cast("long").alias("n_checked"),
    )
    domain = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    vals = o.agg(
        F.lit("priority_accepted_values").alias("check_name"),
        F.sum(F.when(~F.col("o_orderpriority").isin(domain), 1).otherwise(0))
        .cast("long")
        .alias("n_violations"),
        F.count("*").cast("long").alias("n_checked"),
    )
    orphans = (
        li.join(o.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_anti")
        .agg(F.count("*").cast("long").alias("n_violations"))
        .select(
            F.lit("fk_lineitem_orders").alias("check_name"),
            "n_violations",
            F.lit(None).cast("long").alias("n_checked"),
        )
    )
    n_li = li.agg(F.count("*").cast("long").alias("__n"))
    orphans = orphans.crossJoin(F.broadcast(n_li)).select(
        "check_name", "n_violations", F.col("__n").alias("n_checked")
    )
    return (
        uniq.unionByName(rng).unionByName(vals).unionByName(orphans)
        .orderBy("check_name")
    )


def q185_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality-rule battery (Rae et al. 2021's filter
    archetypes re-expressed for this fixture's vocabulary): five
    boolean gates per document — word count in range, mean word length
    in range, distinct-word ratio (repetition gate), stopword presence,
    single-word dominance — plus the pass-ALL funnel count. Every gate
    is an INTEGER comparison (e.g. mean-word-length 3 <= sum_len/n <= 10
    graded as 3*n <= sum_len AND sum_len <= 10*n), so there is no float
    anywhere in the grade. All expressions are narrow column ops
    (split/array_distinct/array_intersect/transform) — zero shuffles
    before the final 1-row aggregate; the dominance gate scans
    distinct-words x words per row, bounded by the fixture's tiny
    vocabulary and by typical natural-text distinct counts, not by
    corpus size. q54 grades quality SCORES; this grades the GATE
    battery and its funnel, which is what a curation pipeline actually
    filters with."""
    d = _t(spark, sf_dir, "documents")
    w = F.split("text", " ")
    per = d.select(
        F.size(w).alias("n"),
        F.length(F.regexp_replace("text", " ", "")).alias("sum_len"),
        F.size(F.array_distinct(w)).alias("n_dist"),
        F.size(
            F.array_intersect(
                F.array_distinct(w),
                F.array(*[F.lit(s) for s in ("the", "a", "of", "to", "and")]),
            )
        ).alias("n_stop"),
        max_token_multiplicity(w).alias("max_cnt"),
    )
    flags = per.select(
        ((F.col("n") >= 30) & (F.col("n") <= 10000)).alias("r_count"),
        (
            (F.col("sum_len") >= 3 * F.col("n"))
            & (F.col("sum_len") <= 10 * F.col("n"))
        ).alias("r_wlen"),
        (F.col("n_dist") * 10 >= 3 * F.col("n")).alias("r_dist"),
        (F.col("n_stop") >= 2).alias("r_stop"),
        (F.col("max_cnt") * 5 <= F.col("n")).alias("r_dom"),
    )
    agg = flags.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(~F.col("r_count"), 1).otherwise(0)).alias("f1"),
        F.sum(F.when(~F.col("r_wlen"), 1).otherwise(0)).alias("f2"),
        F.sum(F.when(~F.col("r_dist"), 1).otherwise(0)).alias("f3"),
        F.sum(F.when(~F.col("r_stop"), 1).otherwise(0)).alias("f4"),
        F.sum(F.when(~F.col("r_dom"), 1).otherwise(0)).alias("f5"),
        F.sum(
            F.when(
                F.col("r_count")
                & F.col("r_wlen")
                & F.col("r_dist")
                & F.col("r_stop")
                & F.col("r_dom"),
                1,
            ).otherwise(0)
        ).alias("np"),
    )
    return agg.selectExpr(
        """stack(6,
            'fail_word_count', f1,
            'fail_word_length', f2,
            'fail_distinct_ratio', f3,
            'fail_stopwords', f4,
            'fail_dominance', f5,
            'pass_all', np) AS (rule, n)""",
        "n_docs",
    ).selectExpr("rule", "CAST(n AS BIGINT) AS n", "n_docs").orderBy("rule")


def q265_gate_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate ATTRIBUTION — the tuning companion q185's totals can't
    answer: for each Gopher gate, how many docs fail it at all vs fail
    ONLY it (the binding gate — exactly the docs that one threshold
    change would recover). Same five integer gates as q185/q208
    (word-count range, mean word length by cross-multiplication,
    distinct ratio, stopword presence, dominance). Graded per gate:
    n_fail, n_fail_only, and the recoverable share of the corpus in bp.
    Scale: identical narrow per-row flag expressions, one 1-row
    aggregate, a 5-row stack — zero data-sized shuffles."""
    d = _t(spark, sf_dir, "documents")
    w = F.split("text", " ")
    per = d.select(
        F.size(w).alias("n"),
        F.length(F.regexp_replace("text", " ", "")).alias("sum_len"),
        F.size(F.array_distinct(w)).alias("n_dist"),
        F.size(
            F.array_intersect(
                F.array_distinct(w),
                F.array(*[F.lit(s) for s in ("the", "a", "of", "to", "and")]),
            )
        ).alias("n_stop"),
        max_token_multiplicity(w).alias("max_cnt"),
    )
    flags = per.select(
        ((F.col("n") >= 30) & (F.col("n") <= 10000)).alias("r1"),
        (
            (F.col("sum_len") >= 3 * F.col("n"))
            & (F.col("sum_len") <= 10 * F.col("n"))
        ).alias("r2"),
        (F.col("n_dist") * 10 >= 3 * F.col("n")).alias("r3"),
        (F.col("n_stop") >= 2).alias("r4"),
        (F.col("max_cnt") * 5 <= F.col("n")).alias("r5"),
    ).select(
        "*",
        (
            F.when(~F.col("r1"), 1).otherwise(0)
            + F.when(~F.col("r2"), 1).otherwise(0)
            + F.when(~F.col("r3"), 1).otherwise(0)
            + F.when(~F.col("r4"), 1).otherwise(0)
            + F.when(~F.col("r5"), 1).otherwise(0)
        ).alias("nf"),
    )
    agg = flags.agg(
        F.count("*").alias("nd"),
        *[
            x
            for i in range(1, 6)
            for x in (
                F.sum(F.when(~F.col(f"r{i}"), 1).otherwise(0)).alias(f"f{i}"),
                F.sum(
                    F.when((~F.col(f"r{i}")) & (F.col("nf") == 1), 1).otherwise(0)
                ).alias(f"o{i}"),
            )
        ],
    )
    names = [
        "word_count", "word_length", "distinct_ratio", "stopwords", "dominance",
    ]
    stacked = agg.selectExpr(
        "stack(5, "
        + ", ".join(f"'{names[i - 1]}', f{i}, o{i}" for i in range(1, 6))
        + ") AS (gate, n_fail, n_fail_only)",
        "nd",
    )
    return stacked.select(
        "gate",
        F.col("n_fail").cast("long").alias("n_fail"),
        F.col("n_fail_only").cast("long").alias("n_fail_only"),
        F.round(F.lit(1e4) * F.col("n_fail_only") / F.col("nd"), 0)
        .cast("long")
        .alias("recoverable_bp"),
    ).orderBy("gate")


def q198_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screening per group — median/MAD (median absolute
    deviation), the quality gate that survives the heavy tails that
    break mean/stddev z-scores: per market segment, the median account
    balance, the MAD, and how many customers sit more than 3 MADs out.
    Cross-engine exactness without tolerance: balances are integer
    CENTS, so every interpolated median is on the exact 0.5-cent binary
    grid ((a+b)/2 of int64s), deviations land on the same grid, the MAD
    on the 0.25 grid — Spark's ``percentile`` and duckdb's
    ``quantile_cont`` compute bit-identical doubles and the strict
    ``> 3*MAD`` comparison cannot straddle an ulp. Plan: three
    aggregate passes over the segment key (median → MAD → outlier
    count), each tiny stats frame broadcast back — exact nested
    medians need re-passes by definition; at 100 TB the medians would
    swap to the GK/t-digest sketch (q118's audit contract) if
    approximation were acceptable."""
    c = _t(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    med = c.groupBy("c_mktsegment").agg(
        F.percentile("cents", 0.5).alias("med_cents"),
        F.count("*").cast("long").alias("n"),
    )
    dev = c.join(F.broadcast(med), "c_mktsegment").select(
        "c_mktsegment",
        "med_cents",
        "n",
        F.abs(F.col("cents") - F.col("med_cents")).alias("__dev"),
    )
    mad = dev.groupBy("c_mktsegment", "med_cents", "n").agg(
        F.percentile("__dev", 0.5).alias("mad_cents")
    )
    return (
        dev.select("c_mktsegment", "__dev")
        .join(F.broadcast(mad), "c_mktsegment")
        .groupBy("c_mktsegment", "n", "med_cents", "mad_cents")
        .agg(
            F.sum(
                F.when(F.col("__dev") > 3 * F.col("mad_cents"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers")
        )
        .select("c_mktsegment", "n", "med_cents", "mad_cents", "n_outliers")
        .orderBy("c_mktsegment")
    )


def q224_quarantine_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation-suite ROUTING (the Great-Expectations/dbt-test
    quarantine pattern; q177 grades the summary, this grades the row
    disposition): each order passes a prioritized rule battery and is
    routed valid/quarantine with FIRST-failed-rule attribution —
    r1 missing customer (RI), r2 negative customer balance, r3 price
    cap, r4 pending status. One left join to the customer dim + narrow
    flags; graded as (disposition, first_failed_rule) counts and exact
    cents, so a mis-routed row or wrong attribution order flips the
    grade. Scale: the dim join is broadcastable; everything else is a
    narrow map + one tiny aggregate."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    j = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"], "left")
    first = (
        F.when(F.col("c_custkey").isNull(), "r1_missing_customer")
        .when(F.col("c_acctbal") < 0, "r2_negative_acctbal")
        .when(F.col("o_totalprice") >= 450000, "r3_price_cap")
        .when(F.col("o_orderstatus") == "P", "r4_pending_status")
    )
    return (
        j.select(
            F.when(first.isNull(), "valid")
            .otherwise("quarantine")
            .alias("disposition"),
            F.coalesce(first, F.lit("none")).alias("first_failed_rule"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("disposition", "first_failed_rule")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .orderBy("disposition", "first_failed_rule")
    )


def q233_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust trimmed mean per group (the outlier-resistant centrality
    stat next to q198's median/MAD): per market segment, drop the
    lowest and highest 5% of balances BY RANK (k = floor(n·5%) rows off
    each tail — integer rank arithmetic, no percentile interpolation
    policy in the predicate) and average the exact-cent survivors as a
    rounded ratio of integers. Reported beside the plain mean so the
    robustness delta is part of the grade. Scale: one rank window per
    group + one aggregate — the window frame is the group's rows, the
    same cost class as any per-group rank."""
    from pyspark.sql import Window

    c = _t(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
        "c_custkey",
    )
    w = Window.partitionBy("c_mktsegment").orderBy("cents", "c_custkey")
    ranked = c.select(
        "c_mktsegment",
        "cents",
        F.row_number().over(w).cast("long").alias("__r"),
        F.count("*").over(Window.partitionBy("c_mktsegment")).cast("long").alias("__n"),
    )
    k = F.floor(F.col("__n") * 5 / 100)
    kept = ranked.filter(
        (F.col("__r") > k) & (F.col("__r") <= F.col("__n") - k)
    )
    trimmed = kept.groupBy("c_mktsegment").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.round(F.sum("cents") / F.count("*"), 0)
        .cast("long")
        .alias("trimmed_mean_cents"),
    )
    plain = c.groupBy("c_mktsegment").agg(
        F.count("*").cast("long").alias("n_all"),
        F.round(F.sum("cents") / F.count("*"), 0)
        .cast("long")
        .alias("mean_cents"),
    )
    return (
        plain.join(trimmed, "c_mktsegment")
        .select(
            "c_mktsegment", "n_all", "mean_cents", "n_kept",
            "trimmed_mean_cents",
        )
        .orderBy("c_mktsegment")
    )


def _quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared trainer/scorer for the q242 quality gate and the q252
    filter-bias audit: md5 half split, mean-token-length >= 4.5 teacher
    label, ppm odds token weights from the train split, broadcast-map
    shuffle-free scoring fold. Returns one row per doc WITH tokens:
    (doc_id, split, label, m) — m the round(ppm-sum / n_toks) score."""
    from pandas_streaming_spark.operators.sampling import hash_split

    raw = hash_split(
        _t(spark, sf_dir, "documents"), "doc_id", {"train": 50, "eval": 50}
    )
    sum_len = F.aggregate(
        F.split("text", " "),
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.when(t == "", 0).otherwise(F.length(t)),
    )
    n_toks = F.aggregate(
        F.split("text", " "),
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.when(t == "", 0).otherwise(1),
    )
    docs = raw.select(
        "doc_id",
        "split",
        "text",
        n_toks.alias("__n"),
        sum_len.alias("__sl"),
    ).withColumn(
        "label",
        ((F.col("__n") > 0) & (2 * F.col("__sl") >= 9 * F.col("__n")))
        .cast("int"),
    )
    tok = (
        docs.filter(F.col("split") == "train")
        .select("label", F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
    )
    wts = tok.groupBy("token").agg(
        F.round(
            F.lit(1e6) * (F.sum("label") + 1) / (F.count("*") + 2), 0
        )
        .cast("long")
        .alias("w")
    )
    model = wts.agg(
        F.map_from_entries(F.collect_list(F.struct("token", "w"))).alias("__m")
    )
    score = F.aggregate(
        F.split("text", " "),
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.when(t == "", 0).otherwise(
            F.coalesce(F.element_at("__m", t), F.lit(500000))
        ),
    )
    return (
        docs.filter(F.col("__n") > 0)
        .join(F.broadcast(model))
        .select(
            "doc_id",
            "split",
            "label",
            F.round(score / F.col("__n"), 0).cast("long").alias("m"),
        )
        .localCheckpoint(eager=False)
    )


def q242_trained_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINED linear quality classifier (VERDICT r9 item 6 — the one
    Gopher-stack piece the battery lacked): fastText-shape per-token
    weights learned IN-ENGINE from a labeled subset, then one
    broadcast-model, shuffle-free scoring pass — the classifier-cascade
    pattern (distill an expensive rule into a cheap linear pre-filter).

    Setup: the teacher label is a crisp quality rule the fixture's text
    actually carries — mean token length ≥ 4.5 (all-integer form
    ``2·Σlen ≥ 9·n_toks``; token-less docs label 0). Train split = md5
    doc-id halves (operators.sampling.hash_split — content-addressed,
    so the oracle re-derives membership). Per-token weight = smoothed
    P(pos | token) in exact ppm: ``w_t = round(1e6 · (pos_t + 1) /
    (pos_t + neg_t + 2))`` — an integer ratio of exact integer counts,
    so training is one token aggregate and the model is a |vocab|-row
    integer table. Scoring: the model rides ONE 1-row broadcast map
    (map_from_entries over the weight table — exactly how a fastText
    model ships to executors) and each doc folds its own tokens through
    it (F.aggregate; unseen tokens score the neutral 500000), so the
    corpus pass is a narrow map with NO shuffle and NO token
    re-explosion. Per-doc score ``m`` = round(Σw / n_toks) ppm.
    Decision threshold: CALIBRATED ON TRAIN — τ = round((round(mean m |
    pos) + round(mean m | neg)) / 2), the balanced midpoint (a 1-row
    broadcast); pred = m > τ. Every quantity an integer or a double
    both engines derive identically from exact integer sums.

    Graded: the EVAL-split confusion matrix (label × pred: doc counts +
    exact Σm) — measured 86% accuracy vs a 54% prior at sf0.01, a
    genuinely learned gate, not a re-evaluation of the teacher rule
    (token-less docs carry no evidence and are excluded from both
    calibration and grade on both engines). Scale: training aggregates
    the train-split tokens once (map-side combined); calibration is a
    2-row aggregate; scoring touches each corpus row once."""
    scored = _quality_scores(spark, sf_dir)
    tau = (
        scored.filter(F.col("split") == "train")
        .agg(
            F.round(F.avg(F.when(F.col("label") == 1, F.col("m")))).alias("__a1"),
            F.round(F.avg(F.when(F.col("label") == 0, F.col("m")))).alias("__a0"),
        )
        .select(
            F.round((F.col("__a1") + F.col("__a0")) / 2, 0)
            .cast("long")
            .alias("__tau")
        )
    )
    return (
        scored.filter(F.col("split") == "eval")
        .join(F.broadcast(tau))
        .select(
            "label",
            (F.col("m") > F.col("__tau")).cast("int").alias("pred"),
            "m",
        )
        .groupBy("label", "pred")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("m").cast("long").alias("sum_m"),
        )
        .orderBy("label", "pred")
    )


def q252_filter_bias_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-BIAS audit — the curation-governance question behind any
    learned quality gate: what does the filter correlate with? Bins
    every scored doc by LENGTH quartile (n_chars, NTILE(4) via the
    distributed global_index + the q210 floor-balanced formula — no
    unpartitioned rank window) and reports the q242 classifier's mean
    score and positive-label share per bin. On this fixture the audit
    DETECTS the gate's length bias by construction (the teacher rule is
    a length-per-token cut) — which is exactly the report's job: a gate
    that silently prefers long documents skews the corpus mix, and this
    is the table that catches it before a 100 TB filter run. Graded per
    quartile: doc count, char range, mean score (rounded ratio of exact
    integers), positive share in bp."""
    from pandas_streaming_spark.operators.indexing import global_index

    scored = _quality_scores(spark, sf_dir)
    d = scored.join(
        _t(spark, sf_dir, "documents").select("doc_id", "n_chars"), "doc_id"
    )
    gi = global_index(d, ["n_chars", "doc_id"], "__i")
    n = gi.df.agg(F.count("*").cast("long").alias("__n"))
    r = F.col("__i")
    q = F.floor(F.col("__n") / 4).cast("long")
    rem = F.pmod(F.col("__n"), F.lit(4)).cast("long")
    quart = (
        F.when(r < rem * (q + 1), F.floor(r / (q + 1)))
        .otherwise(rem + F.floor((r - rem * (q + 1)) / q))
        + 1
    ).cast("long")
    out = (
        gi.df.join(F.broadcast(n))
        .select(quart.alias("len_quartile"), "n_chars", "label", "m")
        .groupBy("len_quartile")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
            F.round(F.sum("m") / F.count("*"), 0).cast("long").alias("mean_score"),
            F.round(F.lit(1e4) * F.sum("label") / F.count("*"), 0)
            .cast("long")
            .alias("pos_share_bp"),
        )
        .orderBy("len_quartile")
        .localCheckpoint(eager=True)
    )
    gi.release()
    return out


def q257_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit — the classic fabricated-data screen
    for financial columns (genuine multiplicative amounts follow
    P(d) = log10(1 + 1/d); fabricated ones usually don't): leading
    digit of each positive order total in cents, observed share per
    digit in bp beside the Benford expectation (a 9-value LITERAL both
    engines embed — computed once from log10 at build time, so no
    transcendental enters the grade) and the absolute deviation.
    A uniform synthetic price column FAILS this audit loudly — that is
    the point of running it on a fixture. Scale: one map-side-combined
    9-group aggregate over one scan."""
    import math

    benford_bp = [round(1e4 * math.log10(1 + 1 / d)) for d in range(1, 10)]
    o = (
        _t(spark, sf_dir, "orders")
        .select(F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"))
        .filter(F.col("cents") > 0)
    )
    per = (
        o.select(
            F.substring(F.col("cents").cast("string"), 1, 1)
            .cast("long")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count("*").cast("long").alias("n"))
    )
    tot = per.agg(F.sum("n").cast("long").alias("__t"))
    exp_arr = F.array(*[F.lit(int(b)) for b in benford_bp])
    return (
        per.join(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.round(F.lit(1e4) * F.col("n") / F.col("__t"), 0)
            .cast("long")
            .alias("share_bp"),
            F.element_at(exp_arr, F.col("digit").cast("int"))
            .cast("long")
            .alias("benford_bp"),
        )
        .withColumn(
            "dev_bp", F.abs(F.col("share_bp") - F.col("benford_bp")).cast("long")
        )
        .orderBy("digit")
    )


def q246_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment winsorization — the outlier-capping normalization
    (clamp every value into its group's [p05, p95] before averaging;
    the robust-stats sibling of q233's trimming, which DROPS the tails
    instead of capping them): discrete p05/p95 per market segment via
    the shared q157 cume_dist idiom, values clamped with
    greatest/least, means graded as rounded ratios of exact cents.
    Graded per segment: n, the caps, clip counts both sides, mean
    before/after. Scale: one per-group window over the |customers|
    frame + a broadcast of the 5-row caps frame back onto the same
    scan."""
    c = _t(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("c_mktsegment").orderBy("cents")
    caps = (
        c.select("c_mktsegment", "cents", F.cume_dist().over(w).alias("cd"))
        .groupBy("c_mktsegment")
        .agg(
            F.min(F.when(F.col("cd") >= 0.05, F.col("cents"))).alias("lo_cents"),
            F.min(F.when(F.col("cd") >= 0.95, F.col("cents"))).alias("hi_cents"),
        )
    )
    clamped = c.join(F.broadcast(caps), "c_mktsegment").select(
        "c_mktsegment",
        "cents",
        "lo_cents",
        "hi_cents",
        F.greatest("lo_cents", F.least("hi_cents", F.col("cents"))).alias(
            "__w"
        ),
    )
    return (
        clamped.groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.first("lo_cents").alias("lo_cents"),
            F.first("hi_cents").alias("hi_cents"),
            F.sum(F.when(F.col("cents") < F.col("lo_cents"), 1).otherwise(0))
            .cast("long")
            .alias("n_clip_lo"),
            F.sum(F.when(F.col("cents") > F.col("hi_cents"), 1).otherwise(0))
            .cast("long")
            .alias("n_clip_hi"),
            F.round(F.sum("cents") / F.count("*"), 0)
            .cast("long")
            .alias("mean_cents"),
            F.round(F.sum("__w") / F.count("*"), 0)
            .cast("long")
            .alias("winsor_mean_cents"),
        )
        .orderBy("c_mktsegment")
    )


_Q288_THRESHOLDS = (35, 40, 45, 50, 55)


def q288_gate_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate THRESHOLD-RESPONSE curve — how the pass rate moves
    as the mean-token-length gate sweeps 3.5→5.5, per source (the table
    that SETS the gate: q185 applies fixed Gopher thresholds, q265 says
    which gate binds, q252 measures the bias of a chosen gate — this is
    the knob-response you look at BEFORE choosing). Pass test is the
    exact integer cross-multiplication ``10·sum_len ≥ t_e1·n`` (q185's
    convention: sum_len = non-space chars, n = split length — no float
    in any gate decision); pass shares in ppm. Scale: one narrow map
    per doc + a 5-row explode + one map-side-combined aggregate — the
    whole sweep is one corpus pass."""
    docs = _t(spark, sf_dir, "documents")
    per = docs.select(
        "source",
        F.length(F.regexp_replace("text", " ", "")).cast("long").alias("sum_len"),
        F.size(F.split("text", " ")).cast("long").alias("n"),
    )
    grid = per.select(
        "*",
        F.explode(
            F.array(*[F.lit(t).cast("long") for t in _Q288_THRESHOLDS])
        ).alias("threshold_e1"),
    )
    return (
        grid.groupBy("source", "threshold_e1")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(
                (F.lit(10) * F.col("sum_len") >= F.col("threshold_e1") * F.col("n"))
                .cast("long")
            )
            .cast("long")
            .alias("n_pass"),
        )
        .select(
            "source",
            "threshold_e1",
            "n_docs",
            "n_pass",
            F.round(F.lit(1e6) * F.col("n_pass") / F.col("n_docs"), 0)
            .cast("long")
            .alias("pass_ppm"),
        )
        .orderBy("source", "threshold_e1")
    )


_PPL_B = 4096  # hashed word-vocab buckets — bounds the LM to <= B² cells
# at ANY corpus size (the KenLM-pruning analog that keeps it broadcastable)


def q290_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style PERPLEXITY BUCKETING (Wenzek et al. 2020) — the
    head/middle/tail split web-scale curation applies after training a
    reference LM on a trusted domain: train a hashed word-bigram LM on
    the ``lang = 'en'`` slice (md5 buckets, ``_PPL_B = 4096`` — the
    model is count-bounded and broadcastable at any corpus size, the
    KenLM-pruning analog), score EVERY document's cross-entropy under
    it with add-one smoothing, and cut each language into perplexity
    terciles (ntile(3) over the exact e3 per-doc cross-entropy with
    doc_id tie-break — a deterministic total order both engines share).
    Every per-bigram log-prob is the integer half-bit difference
    hb(c1 + B) − hb(c12 + 1) ≥ 0 (hb = the q275 quantization), so doc
    scores are exact longs. Graded per (lang, bucket): docs, mean
    cross-entropy per bigram (e3, rounded ratio of exact sums), and the
    bucket's token share of its language in ppm — the table CCNet uses
    to decide which tail to drop. Docs with < 2 words have no bigrams
    and are excluded (they go to length gates, not the LM). Scale: one
    pass to build the bounded model, one broadcast-join scoring pass,
    one per-lang window over doc-level rows, one rollup."""
    docs = _t(spark, sf_dir, "documents")
    hash_words = (
        "transform(split(text, ' '), w -> "
        "CAST(conv(substring(md5(w), 1, 7), 16, 10) AS BIGINT) % " + str(_PPL_B) + ")"
    )
    bi = docs.select(
        "doc_id",
        "lang",
        F.expr(hash_words).alias("__hw"),
    ).select(
        "doc_id",
        "lang",
        F.expr(
            "explode(transform("
            "IF(size(__hw) >= 2, sequence(1, size(__hw) - 1), "
            "CAST(array() AS array<int>)), i -> "
            "struct(element_at(__hw, i) AS b1, element_at(__hw, i + 1) AS b2)))"
        ).alias("__bg"),
    ).select("doc_id", "lang", F.col("__bg.b1").alias("b1"), F.col("__bg.b2").alias("b2"))
    en = bi.filter(F.col("lang") == "en")
    c2 = en.groupBy("b1", "b2").agg(F.count("*").cast("long").alias("__c2"))
    c1 = en.groupBy("b1").agg(F.count("*").cast("long").alias("__c1"))
    scored = (
        bi.join(F.broadcast(c2), ["b1", "b2"], "left")
        .join(F.broadcast(c1), "b1", "left")
        .select(
            "doc_id",
            "lang",
            (
                F.expr(hb_sql(f"(coalesce(__c1, 0) + {_PPL_B})"))
                - F.expr(hb_sql("(coalesce(__c2, 0) + 1)"))
            ).alias("__ce"),
        )
    )
    per_doc = scored.groupBy("doc_id", "lang").agg(
        F.sum("__ce").cast("long").alias("__ces"),
        F.count("*").cast("long").alias("__nbi"),
    ).select(
        "doc_id",
        "lang",
        "__ces",
        "__nbi",
        F.round(F.lit(1e3) * F.col("__ces") / F.col("__nbi"), 0)
        .cast("long")
        .alias("__ce_e3"),
    )
    from pyspark.sql import Window

    wl = Window.partitionBy("lang").orderBy("__ce_e3", "doc_id")
    cut = per_doc.withColumn("__t", F.ntile(3).over(wl)).select(
        "lang",
        F.when(F.col("__t") == 1, F.lit("head"))
        .when(F.col("__t") == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
        "__ces",
        "__nbi",
    )
    agg = cut.groupBy("lang", "bucket").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("__ces").alias("__s"),
        F.sum("__nbi").alias("__n"),
    )
    wtot = Window.partitionBy("lang")
    return (
        agg.select(
            "lang",
            "bucket",
            "n_docs",
            F.round(F.lit(1e3) * F.col("__s") / F.col("__n"), 0)
            .cast("long")
            .alias("mean_ce_hb_e3"),
            F.round(
                F.lit(1e6) * F.col("__n") / F.sum("__n").over(wtot), 0
            )
            .cast("long")
            .alias("token_share_ppm"),
        )
        .orderBy("lang", "bucket")
    )


QUERIES = {
    "q290_perplexity_buckets": q290_perplexity_buckets,
    "q242_trained_quality_gate": q242_trained_quality_gate,
    "q288_gate_calibration": q288_gate_calibration,
    "q246_winsorized_stats": q246_winsorized_stats,
    "q257_benford_audit": q257_benford_audit,
    "q252_filter_bias_audit": q252_filter_bias_audit,
    "q224_quarantine_routing": q224_quarantine_routing,
    "q233_trimmed_mean": q233_trimmed_mean,
    "q177_constraint_audit": q177_constraint_audit,
    "q185_gopher_rules": q185_gopher_rules,
    "q198_robust_outliers": q198_robust_outliers,
    "q265_gate_attribution": q265_gate_attribution,
}

# same integer gates as q185, fail/fail-only split, bp of the corpus
_Q265_ORACLE = """
WITH per AS (
  SELECT LEN(STRING_SPLIT(text, ' ')) AS n,
         LEN(REPLACE(text, ' ', '')) AS sum_len,
         LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS n_dist,
         LEN(LIST_INTERSECT(LIST_DISTINCT(STRING_SPLIT(text, ' ')),
                            ['the','a','of','to','and'])) AS n_stop,
         LIST_MAX(LIST_TRANSFORM(LIST_DISTINCT(STRING_SPLIT(text, ' ')),
                  x -> LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                       y -> y = x)))) AS max_cnt
  FROM documents
),
flags AS (
  SELECT (n >= 30 AND n <= 10000) AS r1,
         (sum_len >= 3*n AND sum_len <= 10*n) AS r2,
         (n_dist*10 >= 3*n) AS r3,
         (n_stop >= 2) AS r4,
         (max_cnt*5 <= n) AS r5
  FROM per
),
nf AS (
  SELECT r1, r2, r3, r4, r5,
         (CASE WHEN r1 THEN 0 ELSE 1 END + CASE WHEN r2 THEN 0 ELSE 1 END
          + CASE WHEN r3 THEN 0 ELSE 1 END + CASE WHEN r4 THEN 0 ELSE 1 END
          + CASE WHEN r5 THEN 0 ELSE 1 END) AS k
  FROM flags
),
agg AS (
  SELECT COUNT(*) AS nd,
         SUM(CASE WHEN NOT r1 THEN 1 ELSE 0 END) AS f1,
         SUM(CASE WHEN NOT r1 AND k = 1 THEN 1 ELSE 0 END) AS o1,
         SUM(CASE WHEN NOT r2 THEN 1 ELSE 0 END) AS f2,
         SUM(CASE WHEN NOT r2 AND k = 1 THEN 1 ELSE 0 END) AS o2,
         SUM(CASE WHEN NOT r3 THEN 1 ELSE 0 END) AS f3,
         SUM(CASE WHEN NOT r3 AND k = 1 THEN 1 ELSE 0 END) AS o3,
         SUM(CASE WHEN NOT r4 THEN 1 ELSE 0 END) AS f4,
         SUM(CASE WHEN NOT r4 AND k = 1 THEN 1 ELSE 0 END) AS o4,
         SUM(CASE WHEN NOT r5 THEN 1 ELSE 0 END) AS f5,
         SUM(CASE WHEN NOT r5 AND k = 1 THEN 1 ELSE 0 END) AS o5
  FROM nf
)
SELECT gate, CAST(n_fail AS BIGINT) AS n_fail,
       CAST(n_fail_only AS BIGINT) AS n_fail_only,
       CAST(ROUND(1e4 * n_fail_only / nd, 0) AS BIGINT) AS recoverable_bp
FROM (
  SELECT 'word_count' AS gate, f1 AS n_fail, o1 AS n_fail_only, nd FROM agg
  UNION ALL SELECT 'word_length', f2, o2, nd FROM agg
  UNION ALL SELECT 'distinct_ratio', f3, o3, nd FROM agg
  UNION ALL SELECT 'stopwords', f4, o4, nd FROM agg
  UNION ALL SELECT 'dominance', f5, o5, nd FROM agg
) ORDER BY gate
"""

# shared q242/q252 scoring chain: md5 split, length-rule teacher label,
# ppm odds weights, neutral-500000 unseen tokens, per-doc m
_QSCORE_PREFIX = """
WITH t0 AS (
  SELECT doc_id, text, n_chars,
         CASE WHEN CAST(CONCAT('0x', SUBSTR(MD5(CAST(doc_id AS VARCHAR)),
                   1, 7)) AS BIGINT) % 100 < 50
              THEN 'eval' ELSE 'train' END AS split
  FROM documents
),
dl AS (
  SELECT doc_id, CAST(SUM(LENGTH(tok)) AS BIGINT) AS sl,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM t0) s
  WHERE tok <> '' GROUP BY doc_id
),
d AS (
  SELECT t0.doc_id, t0.text, t0.split, t0.n_chars, dl.n,
         CAST(COALESCE(2 * dl.sl >= 9 * dl.n, FALSE) AS INT) AS label
  FROM t0 LEFT JOIN dl USING (doc_id)
),
wts AS (
  SELECT token,
         CAST(ROUND(1e6 * (SUM(label) + 1) / (COUNT(*) + 2), 0) AS BIGINT)
           AS w
  FROM (SELECT label, UNNEST(STRING_SPLIT(text, ' ')) AS token
        FROM d WHERE split = 'train') s
  WHERE token <> ''
  GROUP BY token
),
toks AS (
  SELECT doc_id, split, label, n_chars, tok
  FROM (SELECT doc_id, split, label, n_chars,
               UNNEST(STRING_SPLIT(text, ' ')) AS tok
        FROM d WHERE n > 0) s
  WHERE tok <> ''
),
sc AS (
  SELECT t.doc_id, t.split, t.label, t.n_chars,
         CAST(ROUND(SUM(COALESCE(w.w, 500000)) * 1.0 / COUNT(*), 0)
              AS BIGINT) AS m
  FROM toks t LEFT JOIN wts w ON w.token = t.tok
  GROUP BY 1, 2, 3, 4
)"""


ORACLES = {
    # identical md5-hashed bigram LM on the en slice, half-bit integer
    # cross-entropy, per-lang NTILE(3) terciles over (ce_e3, doc_id)
    "q290_perplexity_buckets": f"""
WITH hw AS MATERIALIZED (
  SELECT doc_id, lang,
         LIST_TRANSFORM(STRING_SPLIT(text, ' '),
           w -> CAST(CONCAT('0x', SUBSTR(MD5(w), 1, 7)) AS BIGINT)
                % {_PPL_B}) AS h
  FROM documents
),
bi AS MATERIALIZED (
  SELECT doc_id, lang, h[i] AS b1, h[i + 1] AS b2
  FROM hw, UNNEST(GENERATE_SERIES(1, LEN(h) - 1)) AS s(i)
),
c2 AS MATERIALIZED (
  SELECT b1, b2, CAST(COUNT(*) AS BIGINT) AS c2
  FROM bi WHERE lang = 'en' GROUP BY b1, b2
),
c1 AS MATERIALIZED (
  SELECT b1, CAST(COUNT(*) AS BIGINT) AS c1
  FROM bi WHERE lang = 'en' GROUP BY b1
),
sc AS (
  SELECT bi.doc_id, bi.lang,
         CAST(LENGTH(BIN(((COALESCE(c1.c1, 0) + {_PPL_B})::HUGEINT)
                          * (COALESCE(c1.c1, 0) + {_PPL_B}))) - 1 AS BIGINT)
         - CAST(LENGTH(BIN(((COALESCE(c2.c2, 0) + 1)::HUGEINT)
                            * (COALESCE(c2.c2, 0) + 1))) - 1 AS BIGINT) AS ce
  FROM bi
  LEFT JOIN c2 ON c2.b1 = bi.b1 AND c2.b2 = bi.b2
  LEFT JOIN c1 ON c1.b1 = bi.b1
),
pd AS (
  SELECT doc_id, lang, CAST(SUM(ce) AS BIGINT) AS ces,
         CAST(COUNT(*) AS BIGINT) AS nbi,
         CAST(ROUND(1e3 * SUM(ce) / COUNT(*), 0) AS BIGINT) AS ce3
  FROM sc GROUP BY doc_id, lang
),
cut AS (
  SELECT lang,
         CASE NTILE(3) OVER (PARTITION BY lang ORDER BY ce3, doc_id)
           WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
         ces, nbi
  FROM pd
),
agg AS (
  SELECT lang, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
         SUM(ces) AS s, SUM(nbi) AS n
  FROM cut GROUP BY lang, bucket
)
SELECT lang, bucket, n_docs,
       CAST(ROUND(1e3 * s / n, 0) AS BIGINT) AS mean_ce_hb_e3,
       CAST(ROUND(1e6 * n / (SUM(n) OVER (PARTITION BY lang)), 0) AS BIGINT)
         AS token_share_ppm
FROM agg ORDER BY lang, bucket
""",
    # 5-threshold sweep of the mean-token-length gate, integer cross-mult
    "q288_gate_calibration": """
WITH per AS (
  SELECT source,
         CAST(LEN(REPLACE(text, ' ', '')) AS BIGINT) AS sum_len,
         CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n
  FROM documents
),
grid AS (
  SELECT CAST(t AS BIGINT) AS threshold_e1
  FROM UNNEST([35, 40, 45, 50, 55]) AS u(t)
)
SELECT source, threshold_e1,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN 10 * sum_len >= threshold_e1 * n
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       CAST(ROUND(1e6 * SUM(CASE WHEN 10 * sum_len >= threshold_e1 * n
                                 THEN 1 ELSE 0 END) / COUNT(*), 0)
            AS BIGINT) AS pass_ppm
FROM per, grid
GROUP BY source, threshold_e1
ORDER BY source, threshold_e1
""",
    "q265_gate_attribution": _Q265_ORACLE,
    # same md5 split, mean-token-length >= 4.5 teacher label, ppm odds
    # weights, neutral-500000 unseen tokens, train-midpoint tau, m > tau
    "q242_trained_quality_gate": _QSCORE_PREFIX + """,
tau AS (
  SELECT CAST(ROUND((ROUND(AVG(CASE WHEN label = 1 THEN m END), 0)
                   + ROUND(AVG(CASE WHEN label = 0 THEN m END), 0)) / 2, 0)
              AS BIGINT) AS t
  FROM sc WHERE split = 'train'
)
SELECT label,
       CAST(m > (SELECT t FROM tau) AS INT) AS pred,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(m) AS BIGINT) AS sum_m
FROM sc
WHERE split = 'eval'
GROUP BY 1, 2
ORDER BY label, pred
""",
    # NTILE(4) over (n_chars, doc_id) matches the global_index formula
    "q252_filter_bias_audit": _QSCORE_PREFIX + """,
b AS (
  SELECT CAST(NTILE(4) OVER (ORDER BY n_chars, doc_id) AS BIGINT)
           AS len_quartile,
         n_chars, label, m
  FROM sc
)
SELECT len_quartile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars,
       CAST(ROUND(CAST(SUM(m) AS DOUBLE) / COUNT(*), 0) AS BIGINT)
         AS mean_score,
       CAST(ROUND(1e4 * SUM(label) / COUNT(*), 0) AS BIGINT)
         AS pos_share_bp
FROM b
GROUP BY len_quartile
ORDER BY len_quartile
""",
    # identical first-digit extraction and Benford bp literals
    "q257_benford_audit": """
WITH o AS (
  SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
),
per AS (
  SELECT CAST(SUBSTR(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM o WHERE cents > 0 GROUP BY 1
),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM per)
SELECT digit, n,
       CAST(ROUND(1e4 * n / t.t, 0) AS BIGINT) AS share_bp,
       CAST(CASE digit WHEN 1 THEN 3010 WHEN 2 THEN 1761 WHEN 3 THEN 1249 WHEN 4 THEN 969 WHEN 5 THEN 792 WHEN 6 THEN 669 WHEN 7 THEN 580 WHEN 8 THEN 512 WHEN 9 THEN 458 END AS BIGINT) AS benford_bp,
       CAST(ABS(ROUND(1e4 * n / t.t, 0)
                - (CASE digit WHEN 1 THEN 3010 WHEN 2 THEN 1761 WHEN 3 THEN 1249 WHEN 4 THEN 969 WHEN 5 THEN 792 WHEN 6 THEN 669 WHEN 7 THEN 580 WHEN 8 THEN 512 WHEN 9 THEN 458 END)) AS BIGINT) AS dev_bp
FROM per CROSS JOIN t
ORDER BY digit
""",
    # same cume_dist-discrete caps, greatest/least clamp, rounded means
    "q246_winsorized_stats": """
WITH c AS (
  SELECT c_mktsegment,
         CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS cents
  FROM customer
),
caps AS (
  SELECT c_mktsegment,
         MIN(CASE WHEN cd >= 0.05 THEN cents END) AS lo_cents,
         MIN(CASE WHEN cd >= 0.95 THEN cents END) AS hi_cents
  FROM (SELECT c_mktsegment, cents,
               CUME_DIST() OVER (PARTITION BY c_mktsegment
                                 ORDER BY cents) AS cd
        FROM c)
  GROUP BY c_mktsegment
)
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n,
       caps.lo_cents, caps.hi_cents,
       CAST(SUM(CASE WHEN cents < lo_cents THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clip_lo,
       CAST(SUM(CASE WHEN cents > hi_cents THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clip_hi,
       CAST(ROUND(CAST(SUM(cents) AS DOUBLE) / COUNT(*), 0) AS BIGINT)
         AS mean_cents,
       CAST(ROUND(CAST(SUM(GREATEST(lo_cents, LEAST(hi_cents, cents)))
                       AS DOUBLE) / COUNT(*), 0) AS BIGINT)
         AS winsor_mean_cents
FROM c JOIN caps USING (c_mktsegment)
GROUP BY c.c_mktsegment, caps.lo_cents, caps.hi_cents
ORDER BY c.c_mktsegment
""",
    # same rank-trim rule; means as rounded ratios of exact cents
    "q233_trimmed_mean": """
WITH c AS (
  SELECT c_mktsegment,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents, c_custkey
  FROM customer
), ranked AS (
  SELECT c_mktsegment, cents,
         CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
              ORDER BY cents, c_custkey) AS BIGINT) AS r,
         CAST(COUNT(*) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS n
  FROM c
), kept AS (
  SELECT * FROM ranked
  WHERE r > FLOOR(n * 5 / 100) AND r <= n - FLOOR(n * 5 / 100)
), trimmed AS (
  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_kept,
         CAST(ROUND(1.0 * SUM(cents) / COUNT(*), 0) AS BIGINT)
           AS trimmed_mean_cents
  FROM kept GROUP BY c_mktsegment
), plain AS (
  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_all,
         CAST(ROUND(1.0 * SUM(cents) / COUNT(*), 0) AS BIGINT)
           AS mean_cents
  FROM c GROUP BY c_mktsegment
)
SELECT p.c_mktsegment, p.n_all, p.mean_cents, t.n_kept,
       t.trimmed_mean_cents
FROM plain p JOIN trimmed t USING (c_mktsegment)
ORDER BY p.c_mktsegment
""",
    # same priority CASE; broadcastable dim join re-derived
    "q224_quarantine_routing": """
WITH j AS (
  SELECT o.o_totalprice, o.o_orderstatus, c.c_custkey, c.c_acctbal
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
), r AS (
  SELECT o_totalprice,
         CASE WHEN c_custkey IS NULL THEN 'r1_missing_customer'
              WHEN c_acctbal < 0 THEN 'r2_negative_acctbal'
              WHEN o_totalprice >= 450000 THEN 'r3_price_cap'
              WHEN o_orderstatus = 'P' THEN 'r4_pending_status'
         END AS first
  FROM j
)
SELECT CASE WHEN first IS NULL THEN 'valid' ELSE 'quarantine' END
         AS disposition,
       COALESCE(first, 'none') AS first_failed_rule,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM r GROUP BY 1, 2 ORDER BY disposition, first_failed_rule
""",
    # quantile_cont == Spark percentile: both interpolate (a+b)/2 on
    # exact int64 cent values -> bit-identical doubles
    "q198_robust_outliers": """
WITH c AS (
  SELECT c_mktsegment, CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer
), med AS (
  SELECT c_mktsegment, QUANTILE_CONT(cents, 0.5) AS med_cents,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM c GROUP BY c_mktsegment
), dev AS (
  SELECT c.c_mktsegment, med.med_cents, med.n,
         ABS(c.cents - med.med_cents) AS d
  FROM c JOIN med USING (c_mktsegment)
), mad AS (
  SELECT c_mktsegment, med_cents, n, QUANTILE_CONT(d, 0.5) AS mad_cents
  FROM dev GROUP BY c_mktsegment, med_cents, n
)
SELECT dev.c_mktsegment, mad.n, mad.med_cents, mad.mad_cents,
       CAST(SUM(CASE WHEN dev.d > 3 * mad.mad_cents THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev JOIN mad USING (c_mktsegment)
GROUP BY dev.c_mktsegment, mad.n, mad.med_cents, mad.mad_cents
ORDER BY dev.c_mktsegment
""",
    "q185_gopher_rules": """
WITH per AS (
  SELECT LEN(STRING_SPLIT(text, ' ')) AS n,
         LEN(REPLACE(text, ' ', '')) AS sum_len,
         LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS n_dist,
         LEN(LIST_INTERSECT(LIST_DISTINCT(STRING_SPLIT(text, ' ')),
                            ['the','a','of','to','and'])) AS n_stop,
         LIST_MAX(LIST_TRANSFORM(LIST_DISTINCT(STRING_SPLIT(text, ' ')),
                  x -> LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                       y -> y = x)))) AS max_cnt
  FROM documents
), flags AS (
  SELECT (n >= 30 AND n <= 10000) AS r_count,
         (sum_len >= 3*n AND sum_len <= 10*n) AS r_wlen,
         (n_dist*10 >= 3*n) AS r_dist,
         (n_stop >= 2) AS r_stop,
         (max_cnt*5 <= n) AS r_dom
  FROM per
), agg AS (
  SELECT COUNT(*) AS n_docs,
         SUM(CASE WHEN NOT r_count THEN 1 ELSE 0 END) AS f1,
         SUM(CASE WHEN NOT r_wlen THEN 1 ELSE 0 END) AS f2,
         SUM(CASE WHEN NOT r_dist THEN 1 ELSE 0 END) AS f3,
         SUM(CASE WHEN NOT r_stop THEN 1 ELSE 0 END) AS f4,
         SUM(CASE WHEN NOT r_dom THEN 1 ELSE 0 END) AS f5,
         SUM(CASE WHEN r_count AND r_wlen AND r_dist AND r_stop AND r_dom
             THEN 1 ELSE 0 END) AS np
  FROM flags
)
SELECT rule, CAST(n AS BIGINT) AS n, n_docs FROM (
  SELECT 'fail_word_count' AS rule, f1 AS n, n_docs FROM agg
  UNION ALL SELECT 'fail_word_length', f2, n_docs FROM agg
  UNION ALL SELECT 'fail_distinct_ratio', f3, n_docs FROM agg
  UNION ALL SELECT 'fail_stopwords', f4, n_docs FROM agg
  UNION ALL SELECT 'fail_dominance', f5, n_docs FROM agg
  UNION ALL SELECT 'pass_all', np, n_docs FROM agg
) ORDER BY rule
""",
    "q177_constraint_audit": """
WITH u AS (
  SELECT 'unique_o_orderkey' AS check_name,
         CAST(COALESCE(SUM(CASE WHEN n > 1 THEN n END), 0) AS BIGINT) AS n_violations,
         CAST(SUM(n) AS BIGINT) AS n_checked
  FROM (SELECT o_orderkey, COUNT(*) AS n FROM orders GROUP BY o_orderkey)
), r AS (
  SELECT 'totalprice_positive',
         CAST(SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
                  THEN 1 ELSE 0 END) AS BIGINT),
         COUNT(*)
  FROM orders
), v AS (
  SELECT 'priority_accepted_values',
         CAST(SUM(CASE WHEN o_orderpriority NOT IN
               ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
             THEN 1 ELSE 0 END) AS BIGINT),
         COUNT(*)
  FROM orders
), f AS (
  SELECT 'fk_lineitem_orders',
         (SELECT COUNT(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = l.l_orderkey)),
         (SELECT COUNT(*) FROM lineitem)
)
SELECT * FROM u UNION ALL SELECT * FROM r
UNION ALL SELECT * FROM v UNION ALL SELECT * FROM f
ORDER BY check_name
""",
}
