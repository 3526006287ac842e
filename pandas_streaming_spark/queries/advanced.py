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
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
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


def q143_rollup_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate reuse (operators/rollup.py): daily stats per
    event type answered from an HOURLY partial table instead of raw
    events — the hypertable rollup pattern. The grade is the merge
    algebra itself: the oracle computes the daily grain straight from
    raw events, so any error in the decomposable partials (count/sum/
    min/max stored, avg derived at read time) hash-mismatches."""
    from pandas_streaming_spark.operators.rollup import (
        rollup_merge,
        time_rollup,
        with_derived,
    )

    ev = _t(spark, sf_dir, "events").withColumn(
        # integer cents: the partial algebra is then EXACT, so the
        # two-level sum can't drift from the oracle's one-level sum
        # (doubles are non-associative; int64 is)
        "cents",
        F.round(F.col("value") * 100, 0).cast("long"),
    )
    hourly = time_rollup(ev, "ts", "hour", ["event_type"], "cents")
    daily = with_derived(rollup_merge(hourly, "day", ["event_type"]))
    return daily.select(
        F.date_format("bucket_ts", "yyyy-MM-dd").alias("day"),
        "event_type",
        F.col("cnt").alias("n"),
        (F.col("sum_v") / 100.0).alias("sum_value"),
        # exact integer rational: cents×1e4 floor-divided by the count.
        # ROUND of a float division is engine-divergent exactly on .xxx5
        # boundaries (Spark rounds the shortest decimal rendering,
        # duckdb the binary value); integer div has one answer.
        F.expr("(sum_v * 10000) div cnt").alias("avg_cents_e4"),
        (F.col("min_v") / 100.0).alias("min_value"),
        (F.col("max_v") / 100.0).alias("max_value"),
    ).orderBy("day", "event_type")


def q144_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (A-Res as a window top-k,
    operators/sampling.weighted_sample_topk): per language, 20 documents
    drawn with probability ∝ n_chars — the corpus-mixing primitive when
    longer/higher-quality docs should be overrepresented. Content-
    addressed uniforms make the sample reproducible AND oracle-exact;
    the output is ids and ranks, never the float keys."""
    from pandas_streaming_spark.operators.sampling import weighted_sample_topk

    docs = _t(spark, sf_dir, "documents")
    return (
        weighted_sample_topk(docs, "doc_id", "n_chars", k=20, partition_by="lang")
        .select("lang", F.col("__ares_rank").alias("rank"), "doc_id", "n_chars")
        .orderBy("lang", "rank")
    )


def q145_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention (the product-analytics staple on the reference's
    event surface): users grouped by first-activity week, retention =
    share still active N weeks later, in exact basis points (integer
    div — no float rounding to diverge on). Two shuffles: the per-user
    first-event aggregate, then the (cohort, week_n) distinct-count; the
    user-cohort frame re-joins the events on user_id — co-partitioned
    with the first aggregate's shuffle at scale."""
    ev = _t(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    sizes = cohort.groupBy("cohort_week").agg(F.count("*").alias("cohort_size"))
    active = (
        ev.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("long")
            .alias("week_n"),
        )
        .distinct()
        .groupBy("cohort_week", "week_n")
        .agg(F.count("*").alias("n_active"))
    )
    return (
        active.join(sizes, "cohort_week")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_n",
            "n_active",
            "cohort_size",
            F.expr("(n_active * 10000) div cohort_size").alias("retention_bp"),
        )
        .orderBy("cohort_week", "week_n")
    )


#: BM25 hyperparameters (standard Robertson defaults)
_BM25_K1, _BM25_B, _BM25_TOPK = 1.2, 0.75, 10


def q146_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 document scoring — the retrieval-side sibling of q81's
    TF-IDF: the 5 highest-DF corpus tokens act as the query, every
    document is scored with Robertson BM25 (k1=1.2, b=0.75), top-10
    returned. Plan: one token pass feeds tf/df/dl; query terms, df and
    the 1-row avgdl aggregate all broadcast; the only data-sized
    shuffles are the two token aggregations. Score emits at 1e-4
    rounding; ranking ties (duplicate docs score identically) break on
    doc_id."""
    docs = _t(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count("*").cast("double").alias("n_docs"))
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).where(F.col("token") != "")
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    query = df_.orderBy(F.col("df").desc(), "token").limit(5)
    avgdl = dl.agg(F.avg("dl").alias("avgdl"))
    idf = (
        query.crossJoin(F.broadcast(n_docs))
        .select(
            "token",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
            ).alias("idf"),
        )
    )
    scored = (
        tf.join(F.broadcast(idf), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(avgdl))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("idf")
                * (F.col("tf") * (_BM25_K1 + 1))
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("score")
        )
    )
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _BM25_TOPK)
        .select("rank", "doc_id", F.round("score", 4).alias("bm25"))
        .orderBy("rank")
    )


def q147_upsert_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot time travel on the q140 MERGE table: replay the events
    as 5 batches, then read VERSION 2 — the state after the first two
    batches only. Version N is exact because every commit's manifest is
    retained (immutable bucket dirs + history in HEAD — the
    Iceberg/Delta snapshot model); the oracle recomputes latest-per-key
    over the deterministic first-2/5 event_id prefix the replay split
    rule defines."""
    import shutil as _sh

    from pandas_streaming_spark.streaming.replay import (
        _fresh_dir,
        replay_events,
        write_replay_batches,
    )
    from pandas_streaming_spark.streaming.upsert import KeyedUpsertSink

    replay_dir = write_replay_batches(spark, sf_dir, 5)
    stream = replay_events(spark, sf_dir, replay_dir)
    sink = KeyedUpsertSink(
        _fresh_dir("upsert-tt"), ["user_id"], ["ts", "event_id"], num_buckets=8
    )
    chkpt = _fresh_dir("chkpt-tt")
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", chkpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    snap = sink.read(spark, version=2).localCheckpoint(eager=True)
    sink.close()
    _sh.rmtree(chkpt, ignore_errors=True)
    return snap.select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.round("value", 2).alias("last_value"),
    ).orderBy("user_id")


def q148_upsert_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (CDC) read between MERGE-table snapshots: keys new or
    changed between version 2 (first 2/5 of the replay) and the final
    version — Iceberg incremental scan / Delta CDF semantics derived
    from snapshot EXCEPT over the retained manifests. event_id is unique
    per row, so 'latest event_id differs' ⟺ 'key changed'; the oracle
    EXCEPTs the two latest-per-key prefixes directly."""
    import shutil as _sh

    from pandas_streaming_spark.streaming.replay import (
        _fresh_dir,
        replay_events,
        write_replay_batches,
    )
    from pandas_streaming_spark.streaming.upsert import KeyedUpsertSink

    replay_dir = write_replay_batches(spark, sf_dir, 5)
    stream = replay_events(spark, sf_dir, replay_dir)
    sink = KeyedUpsertSink(
        _fresh_dir("upsert-cdc"), ["user_id"], ["ts", "event_id"], num_buckets=8
    )
    chkpt = _fresh_dir("chkpt-cdc")
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", chkpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    delta = (
        sink.changes(spark, from_version=2)
        .select("user_id", "event_id")
        .localCheckpoint(eager=True)
    )
    sink.close()
    _sh.rmtree(chkpt, ignore_errors=True)
    return delta.orderBy("user_id", "event_id")


def q149_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 built from the event stream:
    collapse each user's CONSECUTIVE runs of the same event_type into
    validity intervals (valid_from .. valid_to, open-ended current row)
    with a version number — the warehouse dimension-history shape. One
    key window for the change flags + running version, one group-by for
    the interval bounds, one lead window for valid_to."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        )
        .otherwise(0)
        .alias("chg"),
    ).withColumn("version", F.sum("chg").over(w))
    runs = flagged.groupBy("user_id", "version").agg(
        F.min("event_type").alias("event_type"),  # constant within a run
        F.min("ts").alias("valid_from"),
        F.count("*").alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("version")
    return (
        runs.withColumn("valid_to", F.lead("valid_from").over(w2))
        .select(
            "user_id",
            "version",
            "event_type",
            F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
            F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
            "n_events",
        )
        .orderBy("user_id", "version")
    )


def q150_path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event path analysis (first-order Markov transitions): per-user
    consecutive event pairs, global transition counts, and the
    transition probability per source state in exact basis points. One
    key window + one pair aggregate — the navigation/funnel-exploration
    query product analytics runs constantly."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .where(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )
    wsrc = Window.partitionBy("from_type")
    return (
        pairs.withColumn("src_total", F.sum("n").over(wsrc))
        .select(
            "from_type",
            "to_type",
            "n",
            F.expr("(n * 10000) div src_total").alias("prob_bp"),
        )
        .orderBy("from_type", "to_type")
    )


def q152_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-vs-interval overlap join (operators/intervals.py): each
    user's 30-minute-gap sessions against the corpus-wide error hours
    (hours containing ≥1 error event) — "was the user on the site while
    something was broken". The operator bucketizes both interval sets to
    the hour and hash-joins on the bucket (NO BroadcastNestedLoop — the
    naive inequality-only theta join is O(|A|·|B|)), then re-verifies
    the exact overlap. Output: per-user session counts + affected share
    in exact basis points."""
    from pandas_streaming_spark.operators.intervals import interval_overlap_join

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # µs-exact gap on both engines (unix_micros / EPOCH_US): a seconds
    # cast would truncate and split sessions differently than the oracle
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    sessions = (
        ev.withColumn(
            "chg",
            F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
        )
        .withColumn("session_id", F.sum("chg").over(w))
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    err_hours = (
        ev.where(F.col("event_type") == "error")
        .select(F.date_trunc("hour", "ts").alias("e_start"))
        .distinct()
        .withColumn("e_end", F.col("e_start") + F.expr("INTERVAL 1 HOUR"))
    )
    hit = (
        interval_overlap_join(
            sessions, err_hours, "s_start", "s_end", "e_start", "e_end"
        )
        .select("user_id", "session_id")
        .distinct()
        .groupBy("user_id")
        .agg(F.count("*").alias("n_affected"))
    )
    totals = sessions.groupBy("user_id").agg(F.count("*").alias("n_sessions"))
    return (
        totals.join(hit, "user_id", "left")
        .select(
            "user_id",
            "n_sessions",
            F.coalesce("n_affected", F.lit(0)).alias("n_affected"),
            F.expr("(coalesce(n_affected, 0) * 10000) div n_sessions").alias(
                "affected_bp"
            ),
        )
        .orderBy("user_id")
    )


def q153_cume_dist_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two analytic functions the §2.6 family hadn't graded yet:
    ``cume_dist`` (P(X ≤ x) within the partition) and ratio-to-report
    (each customer's share of segment revenue — in exact basis points
    over integer cents, the house float-safe ratio form). One shuffle
    for the per-customer revenue, one window pass for both analytics."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    rev = (
        o.withColumn("cents", F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .groupBy("o_custkey")
        .agg(F.sum("cents").alias("rev_cents"))
        .join(
            F.broadcast(c.select("c_custkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    wseg = Window.partitionBy("c_mktsegment")
    worder = wseg.orderBy("rev_cents", "o_custkey")
    return rev.select(
        "c_mktsegment",
        F.col("o_custkey").alias("custkey"),
        "rev_cents",
        F.round(F.cume_dist().over(worder), 4).alias("cume_dist"),
        F.expr(
            "(rev_cents * 10000) div sum(rev_cents) over (partition by c_mktsegment)"
        ).alias("share_bp"),
    ).orderBy("c_mktsegment", "rev_cents", "custkey")


def q154_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: contiguous event_id runs per user via the
    classic ``id − row_number()`` grouping key (consecutive ids share
    it), summarized per user — the sequence-integrity shape used to
    detect dropped messages / missing ids in an ingest. One window
    pass + two aggregations, all integer-exact."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    islands = (
        ev.select("user_id", "event_id")
        .withColumn("grp", F.col("event_id") - F.row_number().over(w))
        .groupBy("user_id", "grp")
        .agg(
            F.count("*").alias("run_len"),
            F.min("event_id").alias("run_start"),
        )
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.count("*").alias("n_islands"),
            F.max("run_len").alias("longest_run"),
            F.sum("run_len").alias("n_events"),
            F.min("run_start").alias("first_id"),
        )
        .orderBy("user_id")
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


def q157_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles (percentile_disc — the value ACTUALLY in
    the data, vs q20's interpolated continuous form): per order status,
    the smallest value whose cume_dist ≥ p, computed with one window
    pass shared by all three percentiles. Exact-integer grading via
    cents."""
    o = _t(spark, sf_dir, "orders").withColumn(
        "cents", F.round(F.col("o_totalprice") * 100, 0).cast("long")
    )
    w = Window.partitionBy("o_orderstatus").orderBy("cents")
    ranked = o.select(
        "o_orderstatus", "cents", F.cume_dist().over(w).alias("cd")
    )
    return (
        ranked.groupBy("o_orderstatus")
        .agg(
            *[
                F.min(F.when(F.col("cd") >= p, F.col("cents"))).alias(
                    f"p{int(p * 100):02d}_cents"
                )
                for p in (0.25, 0.5, 0.9)
            ]
        )
        .orderBy("o_orderstatus")
    )


QUERIES = {
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
    "q143_rollup_reuse": q143_rollup_reuse,
    "q144_weighted_sample": q144_weighted_sample,
    "q145_cohort_retention": q145_cohort_retention,
    "q146_bm25": q146_bm25,
    "q147_upsert_time_travel": q147_upsert_time_travel,
    "q148_upsert_changes": q148_upsert_changes,
    "q149_scd2_history": q149_scd2_history,
    "q150_path_transitions": q150_path_transitions,
    "q152_interval_overlap": q152_interval_overlap,
    "q153_cume_dist_share": q153_cume_dist_share,
    "q154_gaps_islands": q154_gaps_islands,
    "q156_hll_set_ops": q156_hll_set_ops,
    "q157_percentile_disc": q157_percentile_disc,
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
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
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
    "q143_rollup_reuse": """
WITH c AS (
  SELECT ts, event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d') AS day, event_type,
       COUNT(*) AS n,
       CAST(SUM(cents) AS DOUBLE) / 100.0 AS sum_value,
       CAST(SUM(cents) * 10000 // COUNT(*) AS BIGINT) AS avg_cents_e4,
       CAST(MIN(cents) AS DOUBLE) / 100.0 AS min_value,
       CAST(MAX(cents) AS DOUBLE) / 100.0 AS max_value
FROM c GROUP BY 1, 2 ORDER BY day, event_type
""",
    "q145_cohort_retention": """
WITH cohort AS (
  SELECT user_id, DATE_TRUNC('week', MIN(ts)) AS cw FROM events GROUP BY user_id
),
sizes AS (SELECT cw, COUNT(*) AS cohort_size FROM cohort GROUP BY cw),
active AS (
  SELECT cw, week_n, COUNT(*) AS n_active FROM (
    SELECT DISTINCT e.user_id, c.cw,
           DATE_DIFF('day', c.cw, DATE_TRUNC('week', e.ts)) // 7 AS week_n
    FROM events e JOIN cohort c ON e.user_id = c.user_id
  ) GROUP BY cw, week_n
)
SELECT STRFTIME(active.cw, '%Y-%m-%d') AS cohort_week, week_n, n_active,
       cohort_size,
       CAST(n_active * 10000 // cohort_size AS BIGINT) AS retention_bp
FROM active JOIN sizes ON active.cw = sizes.cw
ORDER BY cohort_week, week_n
""",
    "q146_bm25": """
WITH tok AS (
  SELECT doc_id, t.token
  FROM documents, UNNEST(STRING_SPLIT(text, ' ')) AS t(token)
  WHERE t.token <> ''
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
query AS (SELECT token, df FROM df ORDER BY df DESC, token LIMIT 5),
nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
ad AS (SELECT AVG(dl) AS avgdl FROM dl),
idf AS (
  SELECT token, LN((nd.n_docs - df + 0.5) / (df + 0.5) + 1.0) AS idf
  FROM query, nd
),
scored AS (
  SELECT tf.doc_id,
         SUM(idf.idf * (tf.tf * (1.2 + 1))
             / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / ad.avgdl))) AS score
  FROM tf JOIN idf ON tf.token = idf.token
          JOIN dl ON tf.doc_id = dl.doc_id, ad
  GROUP BY tf.doc_id
)
SELECT rank, doc_id, ROUND(score, 4) AS bm25 FROM (
  SELECT doc_id, score,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM scored
) WHERE rank <= 10 ORDER BY rank
""",
    "q147_upsert_time_travel": """
WITH prefix AS (
  SELECT * FROM events
  WHERE event_id * 5 < 2 * (SELECT COUNT(*) FROM events)
)
SELECT user_id, event_type AS last_event_type, ROUND(value, 2) AS last_value
FROM (
  SELECT user_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM prefix
)
WHERE rn = 1
ORDER BY user_id
""",
    "q156_hll_set_ops": _hll_setops_oracle(),
    "q157_percentile_disc": """
WITH c AS (
  SELECT o_orderstatus, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT o_orderstatus,
       QUANTILE_DISC(cents, 0.25) AS p25_cents,
       QUANTILE_DISC(cents, 0.50) AS p50_cents,
       QUANTILE_DISC(cents, 0.90) AS p90_cents
FROM c GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
    "q154_gaps_islands": """
WITH islands AS (
  SELECT user_id,
         event_id - ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY event_id) AS grp,
         event_id
  FROM events
),
runs AS (
  SELECT user_id, grp, COUNT(*) AS run_len, MIN(event_id) AS run_start
  FROM islands GROUP BY user_id, grp
)
SELECT user_id, COUNT(*) AS n_islands,
       CAST(MAX(run_len) AS BIGINT) AS longest_run,
       CAST(SUM(run_len) AS BIGINT) AS n_events,
       CAST(MIN(run_start) AS BIGINT) AS first_id
FROM runs GROUP BY user_id ORDER BY user_id
""",
    "q153_cume_dist_share": """
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders GROUP BY o_custkey
),
seg AS (
  SELECT c_mktsegment, o_custkey AS custkey, rev_cents
  FROM rev JOIN customer ON o_custkey = c_custkey
)
SELECT c_mktsegment, custkey, rev_cents,
       ROUND(CUME_DIST() OVER (PARTITION BY c_mktsegment
                               ORDER BY rev_cents, custkey), 4) AS cume_dist,
       CAST(rev_cents * 10000 //
            SUM(rev_cents) OVER (PARTITION BY c_mktsegment) AS BIGINT)
         AS share_bp
FROM seg
ORDER BY c_mktsegment, rev_cents, custkey
""",
    "q152_interval_overlap": """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, session_id, MIN(ts) AS s_start, MAX(ts) AS s_end
  FROM (
    SELECT user_id, ts,
           SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS session_id
    FROM flagged
  ) GROUP BY user_id, session_id
),
eh AS (
  SELECT DISTINCT DATE_TRUNC('hour', ts) AS e_start,
         DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR AS e_end
  FROM events WHERE event_type = 'error'
),
hit AS (
  SELECT user_id AS hit_user, COUNT(*) AS n_affected FROM (
    SELECT DISTINCT s.user_id, s.session_id
    FROM sess s JOIN eh ON s.s_start <= eh.e_end AND eh.e_start <= s.s_end
  ) GROUP BY user_id
),
tot AS (SELECT user_id, COUNT(*) AS n_sessions FROM sess GROUP BY user_id)
SELECT tot.user_id, n_sessions,
       COALESCE(n_affected, 0) AS n_affected,
       CAST(COALESCE(n_affected, 0) * 10000 // n_sessions AS BIGINT)
         AS affected_bp
FROM tot LEFT JOIN hit ON tot.user_id = hit.hit_user
ORDER BY user_id
""",
    "q148_upsert_changes": """
WITH pre AS (
  SELECT user_id, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
  WHERE event_id * 5 < 2 * (SELECT COUNT(*) FROM events)
),
v2 AS (SELECT user_id, event_id FROM pre WHERE rn = 1),
fin AS (
  SELECT user_id, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
),
v5 AS (SELECT user_id, event_id FROM fin WHERE rn = 1)
SELECT user_id, event_id FROM v5
EXCEPT
SELECT user_id, event_id FROM v2
ORDER BY user_id, event_id
""",
    "q149_scd2_history": """
WITH flagged AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN LAG(event_type) OVER w IS NULL
                OR LAG(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
versioned AS (
  SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS BIGINT) AS version
  FROM flagged
),
runs AS (
  SELECT user_id, version, MIN(event_type) AS event_type,
         MIN(ts) AS valid_from, COUNT(*) AS n_events
  FROM versioned GROUP BY user_id, version
)
SELECT user_id, version, event_type,
       STRFTIME(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
       STRFTIME(LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version),
                '%Y-%m-%d %H:%M:%S') AS valid_to,
       n_events
FROM runs
ORDER BY user_id, version
""",
    "q150_path_transitions": """
WITH pairs AS (
  SELECT LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS from_type,
         event_type AS to_type
  FROM events
),
counts AS (
  SELECT from_type, to_type, COUNT(*) AS n
  FROM pairs WHERE from_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       CAST(n * 10000 // SUM(n) OVER (PARTITION BY from_type) AS BIGINT)
         AS prob_bp
FROM counts
ORDER BY from_type, to_type
""",
    "q144_weighted_sample": """
WITH keyed AS (
  -- the weight<=0 guard mirrors sampling.py (key NULL, ranked last):
  -- equivalence by construction, not by the fixture never containing
  -- empty documents (ADVICE r5 item 2)
  SELECT lang, doc_id, n_chars,
         CASE WHEN n_chars > 0 THEN POWER(
           (CAST(CONCAT('0x', SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 7))
                 AS BIGINT) + 1.0) / 268435456.0,
           1.0 / n_chars) END AS ares_key
  FROM documents
),
ranked AS (
  SELECT lang, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY ares_key DESC NULLS LAST, doc_id) AS rank
  FROM keyed
)
SELECT lang, rank, doc_id, n_chars
FROM ranked WHERE rank <= 20
ORDER BY lang, rank
""",
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
