"""Round-5 extension entries q130–q139: statistical aggregates the
reference's describe/corr family implies (regression, deterministic mode,
bitwise aggs, sorted collect, autocorrelation), the sketch operators
(Bloom runtime pruning, Count-Min heavy hitters), graph analytics
(triangle count, PageRank), and corpus-statistics ops (Zipf slope, token
entropy).

Every entry keeps the house rules: JVM-side expressions only, explicit
aliases mirrored in the duckdb oracle, floats rounded (or micro-unit
cast) on both sides, deterministic ORDER BY with full tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pandas_streaming_spark.catalog import load_table
from pandas_streaming_spark.operators.graph import pagerank, triangle_count
from pandas_streaming_spark.operators.sketches import (
    bloom_prune,
    cms_bucket_sql,
    cms_build,
    cms_estimate,
)


# moved to warehouse.py in round 6 (module split); re-exported for compatibility
# (q146_bm25 moved again to textq.py in the round-8 rebalance)
from pandas_streaming_spark.queries.textq import q146_bm25  # noqa: F401
# round-9 rebalance: diagnostics/sketch-algebra entries moved to
# diagnostics.py; re-exported for compatibility
from pandas_streaming_spark.queries.diagnostics import (  # noqa: F401
    q214_kmv_distinct,
    q220_skew_report,
    q221_kmv_set_ops,
    q223_join_cardinality,
    q225_contingency_deviation,
)
from pandas_streaming_spark.queries.warehouse import (  # noqa: F401
    q143_rollup_reuse,
    q144_weighted_sample,
    q145_cohort_retention,
    q147_upsert_time_travel,
    q148_upsert_changes,
    q149_scd2_history,
    q150_path_transitions,
    q152_interval_overlap,
    q153_cume_dist_share,
    q154_gaps_islands,
    q157_percentile_disc,
)

def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Statistical aggregates
# --------------------------------------------------------------------------


def q130_regression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in bivariate regression aggregates (reference `corr`/`cov`
    family, SURVEY §2.4): price-vs-quantity fit per return flag. All five
    are single-pass map-side-combined JVM aggregates — the moment sums —
    so the 100 TB cost is one scan + one 3-group shuffle."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 2).alias("slope"),
            F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 2).alias(
                "intercept"
            ),
            F.round(F.regr_r2("l_extendedprice", "l_quantity"), 4).alias("r2"),
            F.round(F.corr("l_extendedprice", "l_quantity"), 4).alias("corr_pq"),
            F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias(
                "covar_pq"
            ),
        )
        .orderBy("l_returnflag")
    )


def q131_mode_bitagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode + bitwise aggregates per group. Spark's
    built-in ``mode()`` is tie-nondeterministic (as is duckdb's), so the
    mode here is the (count DESC, value ASC)-first row of a count
    aggregate — two shuffles, fully reproducible across engines. The
    bit_and/bit_or/bit_xor of the orderkey set are single-pass
    map-side-combined JVM aggregates."""
    li = _t(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(F.count("*").alias("n"))
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("n").desc(), F.col("l_quantity").asc()
    )
    mode = (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("l_returnflag", F.col("l_quantity").alias("mode_qty"))
    )
    bits = li.groupBy("l_returnflag").agg(
        F.bit_and("l_orderkey").alias("band_key"),
        F.bit_or("l_orderkey").alias("bor_key"),
        F.bit_xor("l_orderkey").alias("bxor_key"),
    )
    return bits.join(mode, "l_returnflag").orderBy("l_returnflag")


def q132_sorted_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered array_agg (pandas groupby .apply(list) with a sort): each
    customer's order totals as a sorted cents-joined string. Integer
    cents make the string rendering engine-exact; array_sort after
    collect_list keeps the aggregation map-side-combinable (collecting
    pre-sorted would force a sort-based agg)."""
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.array_join(
                F.array_sort(F.collect_list(cents)), ","
            ).alias("order_cents"),
        )
        .orderBy("o_custkey")
    )


def q133_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lag-1 autocorrelation of event values (time-series
    diagnostics family): one window pass for the lag, one corr aggregate.
    The window order carries a full tie-break (ts, event_id) so the lag
    pairing is engine-deterministic."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id", "value", F.lag("value").over(w).alias("prev_value")
    )
    return (
        lagged.groupBy("user_id")
        .agg(
            F.count("value").alias("n_events"),
            F.round(F.corr("value", "prev_value"), 4).alias("autocorr_lag1"),
        )
        .where(F.col("n_events") >= 20)
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Sketches
# --------------------------------------------------------------------------


def q134_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter join pruning (operators.sketches.bloom_prune):
    the small-parts dim aggregates to a ~KB bitmap, the lineitem scan
    drops non-members inside codegen *before* the join shuffle, then the
    exact join runs on the survivors. No false negatives ⇒ identical
    result to the plain join — which is exactly what the oracle checks
    (duckdb runs the unpruned join). At 100 TB this is the difference
    between shuffling the whole fact table and shuffling ~sel×|fact|."""
    part = _t(spark, sf_dir, "part").where(F.col("p_size") <= 5)
    li = bloom_prune(
        _t(spark, sf_dir, "lineitem"), "l_partkey", part, "p_partkey"
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            # integer cents per line item, summed as longs: ROUND after a
            # float SUM is still accumulation-order-dependent once enough
            # terms stack up — at 10x the double error crossed the .005
            # boundary and flipped a cent vs the oracle (10x axis, r7)
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100,
                    0,
                ).cast("long")
            ).alias("revenue_cents"),
        )
        .orderBy("p_brand")
    )


def q135_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min-Sketch heavy hitters over the document token stream:
    build a 4×256 grid (operators.sketches.cms_build — bounded state
    regardless of corpus size), point-estimate the true top-20 tokens,
    and report the overestimate. The md5-bucket grid is engine-exact, so
    the oracle grades the sketch *values*, not just its shape — the
    overestimate-only invariant (cms_est ≥ true_cnt) is additionally
    pinned in tests."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.split("text", " ")).alias("token")
    ).where(F.col("token") != "")
    truec = tok.groupBy("token").agg(F.count("*").alias("true_cnt"))
    top = truec.orderBy(F.col("true_cnt").desc(), "token").limit(20)
    grid = cms_build(tok, "token", depth=4, width=256)
    est = cms_estimate(top, grid, "token", depth=4, width=256)
    return est.select(
        "token",
        "true_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("true_cnt")).alias("overestimate"),
    ).orderBy(F.col("true_cnt").desc(), "token")


# --------------------------------------------------------------------------
# Graph analytics
# --------------------------------------------------------------------------


def q137_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doulion-style sparsified triangle counting on the supplier
    co-supply graph (suppliers joined by sharing a part — the
    co-occurrence shape of dedup cluster analysis).

    The raw co-supply graph is DEGENERATE at bench scales — at sf0.1 it
    is the complete K_1000 (499,500 edges, 166M triangles), exactly the
    quadratic blowup co-occurrence graphs exhibit on hub objects — so
    the operator follows the published scale remedy (Tsourakakis et
    al.'s Doulion): keep each edge with probability p via a
    deterministic content hash (md5 of the canonical pair, the repo's
    sampling idiom — the oracle reproduces the identical subgraph) and
    count exactly on the sparse graph; tri/p³ is an unbiased estimate
    of the full count, reported alongside. Counting itself is
    degree-oriented wedges (operators.graph.triangle_count): per-node
    fan-out bounded O(sqrt(|E|)), three shuffles, no collect."""
    p_pct = 5  # keep ~5% of edges
    ps = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    a = ps.select(F.col("p"), F.col("s").alias("s1"))
    b = ps.select(F.col("p"), F.col("s").alias("s2"))
    pair_key = F.concat_ws("-", F.col("s1"), F.col("s2"))
    bucket = F.pmod(
        F.conv(F.substring(F.md5(pair_key), 1, 7), 16, 10).cast("long"), F.lit(100)
    )
    # Sample BEFORE the distinct: the hash is content-based, so
    # filter∘distinct ≡ distinct∘filter — but filtering first drops
    # 100/p_pct of the per-part pair fan-out ahead of the dedup shuffle.
    sparse = (
        a.join(b, "p")
        .where((F.col("s1") < F.col("s2")) & (bucket < p_pct))
        .select("s1", "s2")
        .distinct()
    )
    out = triangle_count(sparse, "s1", "s2")
    return out.select(
        "n_vertices",
        "n_edges",
        "n_triangles",
        # Doulion estimator: exact count on the p-sampled graph / p^3
        F.round(F.col("n_triangles") / F.lit((p_pct / 100.0) ** 3), 0)
        .cast("long")
        .alias("est_full_triangles"),
    )


def q138_pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the nation trade graph (customer nation → supplier
    nation through orders×lineitem): 3 damped power iterations
    (operators.graph.pagerank — collect-free loop, dangling mass folded
    back via broadcast aggregate). Ranks reported in micro-units so the
    double sums grade exactly."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("src")
    )
    sn = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("dst")
    )
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(cn), c["c_nationkey"] == cn["c_nk"])
        .join(F.broadcast(sn), s["s_nationkey"] == sn["s_nk"])
        .select("src", "dst")
    )
    ranks = pagerank(edges, "src", "dst", iterations=3, damping=0.85)
    return ranks.select(
        "node", F.round(F.col("rank") * 1e6, 0).cast("long").alias("rank_e6")
    ).orderBy(F.col("rank_e6").desc(), "node")


# --------------------------------------------------------------------------
# Corpus statistics
# --------------------------------------------------------------------------


def q136_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus token frequency spectrum: regression
    of ln(freq) on ln(rank) over the top-100 tokens. The canonical
    one-number corpus health check (natural text ⇒ slope ≈ −1; templated
    or duplicated corpora flatten or steepen it). One token-count
    shuffle + a 100-row window + a 1-row regression aggregate."""
    docs = _t(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )
    w = Window.orderBy(F.col("freq").desc(), "token")
    ranked = counts.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= 100
    )
    return ranked.agg(
        F.count("*").alias("n_tokens"),
        F.round(F.regr_slope(F.log("freq"), F.log("rank")), 4).alias("zipf_slope"),
        F.round(F.regr_r2(F.log("freq"), F.log("rank")), 4).alias("zipf_r2"),
    )


def q139_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token (Shannon) entropy as a quality gate, rolled up
    per language: H = ln(n) − Σ c·ln(c) / n over the doc's token counts.
    Low-entropy docs are boilerplate/repetition — the standard corpus
    filter next to q89's repetition score. Two narrow aggs (doc×token,
    then doc), one per-lang rollup; the formula is shared verbatim with
    the oracle so double error stays below the round-4 grading grain."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("token")
    ).where(F.col("token") != "")
    per_tok = tok.groupBy("doc_id", "lang", "token").agg(F.count("*").alias("c"))
    per_doc = per_tok.groupBy("doc_id", "lang").agg(
        (
            F.log(F.sum("c").cast("double"))
            - F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double")))
            / F.sum("c").cast("double")
        ).alias("entropy")
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("entropy"), 4).alias("avg_entropy"),
            F.round(F.min("entropy"), 4).alias("min_entropy"),
        )
        .orderBy("lang")
    )


def q141_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimate per event type, graded against
    its own construction AND audited against the exact count in one
    frame (the q108/q118 audit pattern). The registers
    (operators.sketches.hll_registers) are MERGEABLE — per-bucket max —
    which is the whole reason HLL is the 100 TB distinct-count: map-side
    partial registers, a ≤64-row-per-group shuffle, merge. Unlike
    approx_count_distinct (engine-internal HLL++, rows-only q64), the
    md5/low-bit construction is engine-exact, so duckdb reproduces every
    register and the ESTIMATE grades on values."""
    from pandas_streaming_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    ev = _t(spark, sf_dir, "events")
    regs = hll_registers(ev, "user_id", "event_type")
    est = hll_estimate(regs, "event_type")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("true_distinct")
    )
    return (
        exact.join(est, "event_type")
        .select(
            "event_type",
            "true_distinct",
            F.round("hll_est", 2).alias("hll_est"),
            F.round(
                F.abs(F.col("hll_est") - F.col("true_distinct"))
                / F.col("true_distinct")
                * 10000,
                0,
            )
            .cast("long")
            .alias("err_bp"),
        )
        .orderBy("event_type")
    )


def q156_hll_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch SET ALGEBRA (the theta-sketch use case on HLL): distinct
    users who click, who purchase, their union (per-bucket register
    max — the only exact HLL set op), and the intersection via
    inclusion-exclusion (est_a + est_b − est_union). At 100 TB this
    answers audience-overlap questions from two 64-register sketches
    instead of a distinct-join over both event streams. Registers are
    engine-exact (q141), so even the derived intersection grades on
    values; the true counts ride along as the audit."""
    from pandas_streaming_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click")
    buys = ev.where(F.col("event_type") == "purchase")
    ra = hll_registers(clicks, "user_id").withColumnRenamed("hll_rho", "rho_a")
    rb = hll_registers(buys, "user_id").withColumnRenamed("hll_rho", "rho_b")
    # union registers = per-bucket max of the two register sets
    ru = (
        ra.join(rb, "hll_bucket", "full")
        .select(
            "hll_bucket",
            F.greatest(
                F.coalesce("rho_a", F.lit(0)), F.coalesce("rho_b", F.lit(0))
            ).alias("hll_rho"),
        )
        .where(F.col("hll_rho") > 0)
    )
    est_a = hll_estimate(ra.withColumnRenamed("rho_a", "hll_rho")).select(
        F.col("hll_est").alias("est_click")
    )
    est_b = hll_estimate(rb.withColumnRenamed("rho_b", "hll_rho")).select(
        F.col("hll_est").alias("est_buy")
    )
    est_u = hll_estimate(ru).select(F.col("hll_est").alias("est_union"))
    true = (
        clicks.select("user_id")
        .agg(F.countDistinct("user_id").alias("true_click"))
        .crossJoin(buys.agg(F.countDistinct("user_id").alias("true_buy")))
        .crossJoin(
            clicks.select("user_id")
            .intersect(buys.select("user_id"))
            .agg(F.count("*").alias("true_both"))
        )
    )
    return (
        true.crossJoin(F.broadcast(est_a))
        .crossJoin(F.broadcast(est_b))
        .crossJoin(F.broadcast(est_u))
        .select(
            "true_click",
            "true_buy",
            "true_both",
            F.round("est_click", 2).alias("est_click"),
            F.round("est_buy", 2).alias("est_buy"),
            F.round("est_union", 2).alias("est_union"),
            F.round(
                F.col("est_click") + F.col("est_buy") - F.col("est_union"), 2
            ).alias("est_both"),
        )
    )


def q160_hll_native_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE DataSketches HLL surface (hll_sketch_agg /
    hll_union_agg / hll_sketch_estimate) under the q64/q118
    error-contract gate — complements q141's engine-exact md5 HLL by
    exercising the built-in sketch the 100 TB path would actually use.
    Per event_type: exact distinct-user anchor + whether the default
    lgConfigK=12 estimate landed within 5% of exact; plus a TOTAL row
    whose estimate comes from hll_union_agg over the per-type sketches —
    the mergeability property (partial sketches union-ed to the global
    answer) is exactly what map-side combine relies on at scale. A
    serde or merge bug flips a boolean instead of grading green."""
    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    rows = per.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.hll_sketch_estimate("sk") - F.col("exact_users"))
            <= F.lit(0.05) * F.col("exact_users")
        ).alias("est_ok"),
    )
    total_exact = ev.agg(F.countDistinct("user_id").alias("exact_users"))
    union_est = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("u_est")
    )
    total = (
        total_exact.crossJoin(F.broadcast(union_est))  # two 1-row frames
        .select(
            F.lit("TOTAL").alias("event_type"),
            "exact_users",
            (
                F.abs(F.col("u_est") - F.col("exact_users"))
                <= F.lit(0.05) * F.col("exact_users")
            ).alias("est_ok"),
        )
    )
    return rows.unionByName(total).orderBy("event_type")


def q180_global_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed global row indexing (operators/indexing.global_index):
    0-based rank of every order under ``ORDER BY o_orderkey`` assigned
    WITHOUT a single-partition sort — range-partition, local row_number,
    tiny per-partition-count prefix-sum broadcast back (the two-phase
    zipWithIndex construction; a bare ``row_number() OVER (ORDER BY …)``
    funnels 100 TB through one task). Graded by per-priority count +
    sum/min/max of the assigned index: any single misassignment anywhere
    shifts a sum. The oracle re-derives the rank with the window form —
    same semantics, different (small-data-only) plan.

    The ≤5-row aggregate is eagerly localCheckpoint-ed so the operator's
    boundary pin (a persisted copy of the full input) can be released
    before returning — one-shot callers must not leak session-lifetime
    executor storage (ADVICE r7)."""
    from pandas_streaming_spark.operators.indexing import global_index

    o = _t(spark, sf_dir, "orders")
    gi = global_index(o, ["o_orderkey"], "row_idx")
    out = (
        gi.df.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum("row_idx").cast("long").alias("sum_idx"),
            F.min("row_idx").cast("long").alias("min_idx"),
            F.max("row_idx").cast("long").alias("max_idx"),
        )
        .orderBy("o_orderpriority")
        .localCheckpoint(eager=True)
    )
    gi.release()
    return out




QUERIES = {
    "q180_global_index": q180_global_index,
    "q160_hll_native_audit": q160_hll_native_audit,
    "q130_regression_stats": q130_regression_stats,
    "q131_mode_bitagg": q131_mode_bitagg,
    "q132_sorted_collect": q132_sorted_collect,
    "q133_autocorr": q133_autocorr,
    "q134_bloom_prune": q134_bloom_prune,
    "q135_cms_heavy_hitters": q135_cms_heavy_hitters,
    "q136_zipf_slope": q136_zipf_slope,
    "q137_triangle_count": q137_triangle_count,
    "q138_pagerank_nations": q138_pagerank_nations,
    "q139_token_entropy": q139_token_entropy,
    "q141_hll_distinct": q141_hll_distinct,
    "q156_hll_set_ops": q156_hll_set_ops,
}


def _hll_setops_oracle() -> str:
    from pandas_streaming_spark.operators.sketches import hll_sql

    def est(src: str) -> str:
        inner = hll_sql("user_id", "'all'").replace(
            "__HLL_SRC__", f"(SELECT user_id FROM events WHERE {src})"
        )
        return f"(SELECT hll_est FROM ({inner}) t)"

    a = est("event_type = 'click'")
    b = est("event_type = 'purchase'")
    u = est("event_type IN ('click', 'purchase')")
    return f"""
WITH est AS (
  SELECT {a} AS est_click, {b} AS est_buy, {u} AS est_union
),
truth AS (
  SELECT
    (SELECT COUNT(DISTINCT user_id) FROM events WHERE event_type = 'click')
      AS true_click,
    (SELECT COUNT(DISTINCT user_id) FROM events WHERE event_type = 'purchase')
      AS true_buy,
    (SELECT COUNT(*) FROM (
       SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
       INTERSECT
       SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
     )) AS true_both
)
SELECT true_click, true_buy, true_both,
       ROUND(est_click, 2) AS est_click,
       ROUND(est_buy, 2) AS est_buy,
       ROUND(est_union, 2) AS est_union,
       ROUND(est_click + est_buy - est_union, 2) AS est_both
FROM truth, est
"""


def _hll_oracle() -> str:
    from pandas_streaming_spark.operators.sketches import hll_sql

    inner = hll_sql("user_id", "event_type").replace("__HLL_SRC__", "events")
    return f"""
WITH exact AS (
  SELECT event_type AS g, COUNT(DISTINCT user_id) AS true_distinct
  FROM events GROUP BY event_type
)
SELECT exact.g AS event_type, true_distinct,
       ROUND(hll.hll_est, 2) AS hll_est,
       CAST(ROUND(ABS(hll.hll_est - true_distinct) / true_distinct * 10000)
            AS BIGINT) AS err_bp
FROM exact JOIN ({inner}) hll ON exact.g = hll.g
ORDER BY event_type
"""


def _cms_oracle() -> str:
    probes = "\n  UNION ALL ".join(
        f"SELECT token, true_cnt, {r} AS r, {cms_bucket_sql('token', r, 256)} AS c FROM top"
        for r in range(4)
    )
    cells = "\n  UNION ALL ".join(
        f"SELECT {r} AS cms_row, {cms_bucket_sql('token', r, 256)} AS cms_col, COUNT(*) AS cms_cnt FROM tok GROUP BY 2"
        for r in range(4)
    )
    return f"""
WITH tok AS (
  SELECT t.token FROM documents, UNNEST(STRING_SPLIT(text, ' ')) AS t(token)
  WHERE t.token <> ''
),
truec AS (SELECT token, COUNT(*) AS true_cnt FROM tok GROUP BY token),
top AS (SELECT token, true_cnt FROM truec ORDER BY true_cnt DESC, token LIMIT 20),
cells AS (
  {cells}
),
probes AS (
  {probes}
)
SELECT p.token, p.true_cnt, MIN(cells.cms_cnt) AS cms_est,
       MIN(cells.cms_cnt) - p.true_cnt AS overestimate
FROM probes p JOIN cells ON cells.cms_row = p.r AND cells.cms_col = p.c
GROUP BY p.token, p.true_cnt
ORDER BY p.true_cnt DESC, p.token
"""


def _pagerank_oracle(iterations: int = 3, damping: float = 0.85) -> str:
    iters = []
    prev = "r0"
    for i in range(1, iterations + 1):
        iters.append(
            f"""r{i} AS (
  SELECT nodes.node,
         (1 - {damping}) / (SELECT n FROM nn)
         + {damping} * (
             COALESCE(c.contrib, 0)
             + (SELECT COALESCE(SUM(r.rank), 0) FROM {prev} r
                LEFT JOIN od ON r.node = od.node WHERE od.node IS NULL)
               / (SELECT n FROM nn)
         ) AS rank
  FROM nodes LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank / od.out_deg) AS contrib
    FROM e JOIN {prev} r ON e.src = r.node JOIN od ON e.src = od.node
    GROUP BY e.dst
  ) c ON nodes.node = c.node
)"""
        )
        prev = f"r{i}"
    chain = ",\n".join(iters)
    return f"""
WITH e AS (
  SELECT DISTINCT cn.n_name AS src, sn.n_name AS dst
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
),
nodes AS (
  SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
od AS (SELECT src AS node, CAST(COUNT(*) AS DOUBLE) AS out_deg FROM e GROUP BY src),
r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),
{chain}
SELECT node, CAST(ROUND(rank * 1e6) AS BIGINT) AS rank_e6
FROM {prev} ORDER BY rank_e6 DESC, node
"""



ORACLES = {
    "q180_global_index": """
WITH t AS (
  SELECT o_orderpriority,
         ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS row_idx
  FROM orders
)
SELECT o_orderpriority, COUNT(*) AS n,
       CAST(SUM(row_idx) AS BIGINT) AS sum_idx,
       CAST(MIN(row_idx) AS BIGINT) AS min_idx,
       CAST(MAX(row_idx) AS BIGINT) AS max_idx
FROM t GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
    "q160_hll_native_audit": """
SELECT event_type, COUNT(DISTINCT user_id) AS exact_users, TRUE AS est_ok
FROM events GROUP BY event_type
UNION ALL
SELECT 'TOTAL', COUNT(DISTINCT user_id), TRUE FROM events
ORDER BY event_type
""",
    "q130_regression_stats": """
SELECT l_returnflag,
       ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 2) AS slope,
       ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 2) AS intercept,
       ROUND(REGR_R2(l_extendedprice, l_quantity), 4) AS r2,
       ROUND(CORR(l_extendedprice, l_quantity), 4) AS corr_pq,
       ROUND(COVAR_SAMP(l_extendedprice, l_quantity), 2) AS covar_pq
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    "q131_mode_bitagg": """
WITH counts AS (
  SELECT l_returnflag, l_quantity, COUNT(*) AS n
  FROM lineitem GROUP BY l_returnflag, l_quantity
),
mode AS (
  SELECT l_returnflag, l_quantity AS mode_qty
  FROM (
    SELECT l_returnflag, l_quantity,
           ROW_NUMBER() OVER (PARTITION BY l_returnflag
                              ORDER BY n DESC, l_quantity ASC) AS rn
    FROM counts
  ) WHERE rn = 1
),
bits AS (
  SELECT l_returnflag,
         BIT_AND(l_orderkey) AS band_key,
         BIT_OR(l_orderkey) AS bor_key,
         BIT_XOR(l_orderkey) AS bxor_key
  FROM lineitem GROUP BY l_returnflag
)
SELECT bits.l_returnflag, band_key, bor_key, bxor_key, mode_qty
FROM bits JOIN mode USING (l_returnflag)
ORDER BY l_returnflag
""",
    "q132_sorted_collect": """
SELECT o_custkey, COUNT(*) AS n_orders,
       ARRAY_TO_STRING(
         LIST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
              ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT)),
         ',') AS order_cents
FROM orders GROUP BY o_custkey ORDER BY o_custkey
""",
    "q133_autocorr": """
WITH lagged AS (
  SELECT user_id, value,
         LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
  FROM events
)
SELECT user_id, COUNT(value) AS n_events,
       ROUND(CORR(value, prev_value), 4) AS autocorr_lag1
FROM lagged GROUP BY user_id
HAVING COUNT(value) >= 20
ORDER BY user_id
""",
    # Bloom pruning has no false negatives, so the oracle is the PLAIN
    # (unpruned) join — the grade checks the runtime filter changed
    # nothing but the scan volume.
    "q134_bloom_prune": """
SELECT p_brand, COUNT(*) AS n_items,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size <= 5
GROUP BY p_brand ORDER BY p_brand
""",
    "q135_cms_heavy_hitters": _cms_oracle(),
    "q136_zipf_slope": """
WITH tok AS (
  SELECT t.token FROM documents, UNNEST(STRING_SPLIT(text, ' ')) AS t(token)
  WHERE t.token <> ''
),
counts AS (SELECT token, COUNT(*) AS freq FROM tok GROUP BY token),
ranked AS (
  SELECT freq, ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS rank
  FROM counts
)
SELECT COUNT(*) AS n_tokens,
       ROUND(REGR_SLOPE(LN(freq), LN(rank)), 4) AS zipf_slope,
       ROUND(REGR_R2(LN(freq), LN(rank)), 4) AS zipf_r2
FROM ranked WHERE rank <= 100
""",
    "q137_triangle_count": """
WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
e_full AS (
  SELECT DISTINCT a.s AS u, b.s AS v
  FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
),
e AS (
  SELECT u, v FROM e_full
  WHERE CAST(CONCAT('0x', SUBSTR(MD5(CONCAT(u, '-', v)), 1, 7)) AS BIGINT) % 100 < 5
),
deg AS (
  SELECT node, COUNT(*) AS deg
  FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
  GROUP BY node
),
o AS (
  SELECT CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND e.u < e.v)
              THEN e.u ELSE e.v END AS s,
         CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND e.u < e.v)
              THEN e.v ELSE e.u END AS t
  FROM e JOIN deg d1 ON e.u = d1.node JOIN deg d2 ON e.v = d2.node
),
wedge AS (
  SELECT e1.s AS a, e1.t AS b, e2.t AS c
  FROM o e1 JOIN o e2 ON e1.s = e2.s AND e1.t < e2.t
),
closing AS (SELECT s AS b, t AS c FROM o UNION ALL SELECT t AS b, s AS c FROM o)
SELECT (SELECT COUNT(*) FROM deg) AS n_vertices,
       (SELECT COUNT(*) FROM e) AS n_edges,
       (SELECT COUNT(*) FROM wedge JOIN closing USING (b, c)) AS n_triangles,
       CAST(ROUND((SELECT COUNT(*) FROM wedge JOIN closing USING (b, c))
                  / 0.05 / 0.05 / 0.05) AS BIGINT) AS est_full_triangles
""",
    "q138_pagerank_nations": _pagerank_oracle(),
    "q141_hll_distinct": _hll_oracle(),
    # Oracle computes the DAILY grain straight from raw events — grading
    # the hourly→daily merge algebra, not just the arithmetic.
    "q156_hll_set_ops": _hll_setops_oracle(),
    "q139_token_entropy": """
WITH tok AS (
  SELECT doc_id, lang, t.token
  FROM documents, UNNEST(STRING_SPLIT(text, ' ')) AS t(token)
  WHERE t.token <> ''
),
per_tok AS (
  SELECT doc_id, lang, token, COUNT(*) AS c FROM tok GROUP BY doc_id, lang, token
),
per_doc AS (
  SELECT doc_id, lang,
         LN(CAST(SUM(c) AS DOUBLE))
         - SUM(CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE))) / CAST(SUM(c) AS DOUBLE)
           AS entropy
  FROM per_tok GROUP BY doc_id, lang
)
SELECT lang, COUNT(*) AS n_docs,
       ROUND(AVG(entropy), 4) AS avg_entropy,
       ROUND(MIN(entropy), 4) AS min_entropy
FROM per_doc GROUP BY lang ORDER BY lang
""",
}
