"""Warehouse & curation analytics split out of `advanced` (round 6,
VERDICT r5 item 8 — keep modules reviewable): rollup reuse, cohort
retention, BM25, upsert time-travel/CDC reads, SCD2, path
transitions, interval overlap, distribution shares, gaps-and-islands,
weighted sampling, discrete percentiles.

House rules unchanged: JVM-side expressions only, explicit aliases
mirrored in the duckdb oracle, floats rounded (or micro-unit cast)
on both sides, deterministic ORDER BY with full tie-breaks.
"""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pandas_streaming_spark.catalog import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


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


def q147_upsert_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot time travel on the q140 MERGE table: replay the events
    as 5 batches, then read VERSION 2 — the state after the first two
    batches only. Version N is exact because every commit's manifest is
    retained (immutable bucket dirs + history in HEAD — the
    Iceberg/Delta snapshot model); the oracle recomputes latest-per-key
    over the deterministic first-2/5 event-time-rank prefix the replay
    split rule defines."""
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


def q161_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order data skipping (operators/zorder.py — the Delta OPTIMIZE
    ZORDER analog): events are laid out along a Morton curve over
    (user_id, hour), then a conjunctive two-dimensional predicate is
    answered from the clustered copy. The oracle runs the SAME predicate
    on the raw table — like the Bloom-prune entry, the layout must be
    result-invariant, which is exactly what the grade checks; the
    pruning effectiveness itself (files whose min/max envelope the scan
    can skip on BOTH dimensions) is pinned in tests/test_scale_ops.
    Sums grade in integer cents so float order cannot flip a digit."""
    from pandas_streaming_spark.operators.zorder import zordered_events_path

    zpath = zordered_events_path(spark, sf_dir)
    ev = spark.read.parquet(zpath)
    return (
        ev.filter(
            (F.col("user_id").between(100, 260))
            & (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-13 00:00:00").cast("timestamp"))
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
                "sum_cents"
            ),
        )
        .orderBy("event_type")
    )


def q163_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT count-distinct via mergeable bitmaps (bitmap_bucket_number /
    bitmap_construct_agg / bitmap_count) — the warehouse pattern for
    COUNT(DISTINCT) at scale: per-(group, bucket) bitmaps build with
    map-side combine and OR-merge associatively, so the same partials
    serve rollups, incremental refresh, and re-aggregation — none of
    which a plain countDistinct's internal dedup can do. Unlike the HLL
    entries this is exact, so the VALUES grade directly against
    COUNT(DISTINCT). Customers-per-priority over orders, plus a TOTAL
    row re-merged from the same partials (bitmap_or_agg) proving the
    merge algebra."""
    o = _t(spark, sf_dir, "orders")
    b = o.select(
        "o_orderpriority",
        F.bitmap_bucket_number("o_custkey").alias("bk"),
        F.bitmap_bit_position("o_custkey").alias("pos"),
    )
    per_bucket = b.groupBy("o_orderpriority", "bk").agg(
        F.bitmap_construct_agg("pos").alias("bm")
    )
    per_prio = per_bucket.groupBy("o_orderpriority").agg(
        F.sum(F.bitmap_count("bm")).cast("long").alias("n_customers")
    )
    total = (
        per_bucket.groupBy("bk")
        .agg(F.bitmap_or_agg("bm").alias("bm"))  # re-merge the partials
        .agg(F.sum(F.bitmap_count("bm")).cast("long").alias("n_customers"))
        .select(F.lit("TOTAL").alias("o_orderpriority"), "n_customers")
    )
    return per_prio.unionByName(total).orderBy("o_orderpriority")


def q184_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the MV stores MERGEABLE
    PARTIALS (count, sum, min, max in exact integer cents) at
    (priority, month) grain; an ingest batch is folded in by aggregating
    ONLY the delta and merging partial-with-partial (counts add, sums
    add, min of mins, max of maxs; avg derived at read time as an exact
    integer rational) — cost ∝ |delta| + |MV|, never a re-read of the
    base fact table. This is the same decomposable-aggregate algebra as
    the hypertable rollup (q143) applied along the INGEST-TIME axis
    rather than the time-grain axis. The base MV is eagerly materialized
    (it is the 'stored' view — the merge plan reads the compact MV, not
    base facts). The oracle recomputes the full aggregate from scratch:
    any merge-algebra error (averaged averages, summed mins) mismatches.
    At 100 TB the delta agg shuffles only the ingest batch and the MV
    union is MV-sized — no scan of history."""
    o = _t(spark, sf_dir, "orders")
    cutoff = "1999-01-01"
    month = F.date_format("o_orderdate", "yyyy-MM").alias("month")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")

    def partials(df: DataFrame) -> DataFrame:
        return df.select("o_orderpriority", month, cents.alias("__c")).groupBy(
            "o_orderpriority", "month"
        ).agg(
            F.count("*").alias("cnt"),
            F.sum("__c").alias("sum_cents"),
            F.min("__c").alias("min_cents"),
            F.max("__c").alias("max_cents"),
        )

    base_mv = partials(
        o.filter(F.col("o_orderdate") < F.lit(cutoff))
    ).localCheckpoint(eager=True)  # the stored view
    delta_mv = partials(o.filter(F.col("o_orderdate") >= F.lit(cutoff)))
    merged = (
        base_mv.unionByName(delta_mv)
        .groupBy("o_orderpriority", "month")
        .agg(
            F.sum("cnt").cast("long").alias("n"),
            F.sum("sum_cents").cast("long").alias("sum_cents"),
            F.min("min_cents").cast("long").alias("min_cents"),
            F.max("max_cents").cast("long").alias("max_cents"),
        )
    )
    return merged.select(
        "o_orderpriority",
        "month",
        "n",
        "sum_cents",
        "min_cents",
        "max_cents",
        F.expr("(sum_cents * 10000) div n").alias("avg_cents_e4"),
    ).orderBy("o_orderpriority", "month")


def q195_funnel_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-window funnel — q94's ordered-stage funnel with the
    constraint every product analytics tool adds: each stage must land
    within 24 h of the user's previous stage time (first-touch: the
    stage-(k−1) anchor is the earliest qualifying event; an expired
    window ends the chain rather than re-opening on later repeats).
    Same ONE-shuffle chained-running-min plan as q94
    (operators/funnel.py) — the gap is one extra integer-microsecond
    predicate per stage, not a per-stage self-join; the oracle states
    the semantics as the explicit 4-level join chain, so the window
    plan's equivalence to the definitional form is what's graded.
    Boundary exactness: both engines compare epoch MICROSECONDS as
    integers (a seconds-double comparison rounds)."""
    from pandas_streaming_spark.operators.funnel import funnel_counts

    return funnel_counts(
        _t(spark, sf_dir, "events"),
        ["signup", "view", "click", "purchase"],
        max_gap_seconds=86400.0,
    )


def q210_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the classic marketing-warehouse
    rollup: per customer recency (latest order date), frequency (order
    count), monetary (lifetime cents); each metric quartiled with
    NTILE(4) under a fully deterministic total order (metric, custkey);
    segments graded as (r,f,m) cells with customer counts and cents.
    Scale: one groupBy(custkey), then each metric's quartile comes from
    the DISTRIBUTED global rank (operators/indexing.global_index —
    range exchange + per-partition window; VERDICT r9 item 3 replaced
    three unpartitioned NTILE windows that funneled the |customers|
    frame through one task) converted to the NTILE(4) bucket by the
    floor-balanced formula: with n rows, q=n div 4, rem=n mod 4, the
    first rem buckets hold q+1 rows — identical to both engines' NTILE
    given the total order. Pins release after the cell aggregate
    materializes (the q234/q196 contract)."""
    from pandas_streaming_spark.operators.indexing import global_index

    o = _t(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_d"),
        F.count("*").cast("long").alias("freq"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
    ).localCheckpoint(eager=False)
    n = per.agg(F.count("*").cast("long").alias("__n"))

    def ntile4(idx: str):  # 0-based global rank -> NTILE(4) bucket
        r = F.col(idx)
        q = F.floor(F.col("__n") / 4).cast("long")
        rem = F.pmod(F.col("__n"), F.lit(4)).cast("long")
        return (
            F.when(r < rem * (q + 1), F.floor(r / (q + 1)))
            .otherwise(rem + F.floor((r - rem * (q + 1)) / q))
            + 1
        ).cast("long")

    gir = global_index(per, ["last_d", "o_custkey"], "__ir")
    gif = global_index(per, ["freq", "o_custkey"], "__if")
    gim = global_index(per, ["cents", "o_custkey"], "__im")
    scored = (
        gim.df.select("o_custkey", "cents", "__im")
        .join(gir.df.select("o_custkey", "__ir"), "o_custkey")
        .join(gif.df.select("o_custkey", "__if"), "o_custkey")
        .join(F.broadcast(n))
        .select(
            "cents",
            ntile4("__ir").alias("r"),
            ntile4("__if").alias("f"),
            ntile4("__im").alias("m"),
        )
    )
    out = (
        scored.groupBy("r", "f", "m")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .orderBy("r", "f", "m")
        .localCheckpoint(eager=True)
    )
    for gi in (gir, gif, gim):
        gi.release()
    return out


def q213_yoy_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year monthly revenue: month totals in exact cents,
    self-joined on month-minus-12 (an equi-join on the shifted month —
    robust to missing months, unlike LAG(12) which silently reads the
    wrong row across gaps), growth in basis points as a rounded ratio
    of exact integers. Scale: the monthly frame is data-reduced
    (|months| rows) — the join and window cost nothing after the one
    map-side-combined aggregate."""
    o = _t(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
    prev = m.select(
        F.add_months(F.col("month"), 12).cast("timestamp").alias("month"),
        F.col("cents").alias("prev_cents"),
    )
    return (
        m.join(prev, "month", "left")
        .select(
            "month",
            "cents",
            "prev_cents",
            F.when(
                F.col("prev_cents").isNotNull(),
                F.round(
                    F.lit(1e4)
                    * (F.col("cents") - F.col("prev_cents"))
                    / F.col("prev_cents"),
                    0,
                ).cast("long"),
            ).alias("yoy_bp"),
        )
        .orderBy("month")
    )


def q212_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent hierarchy shares — the classic OLAP drill
    metric: per-nation revenue with its share of the region (bp) and of
    the grand total (bp), plus rank within region. One star join to the
    data-reduced nation grain, then two partition-sum windows over the
    25-row aggregate (window input is |nations|, not |orders|); shares
    are rounded ratios of exact integer cents."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .alias("cents")
        )
    )
    wr = Window.partitionBy("r_name")
    wt = Window.partitionBy()
    return rev.select(
        "r_name",
        "n_name",
        "cents",
        F.round(F.lit(1e4) * F.col("cents") / F.sum("cents").over(wr), 0)
        .cast("long")
        .alias("region_share_bp"),
        F.round(F.lit(1e4) * F.col("cents") / F.sum("cents").over(wt), 0)
        .cast("long")
        .alias("total_share_bp"),
        F.rank()
        .over(Window.partitionBy("r_name").orderBy(F.col("cents").desc(), "n_name"))
        .cast("long")
        .alias("rank_in_region"),
    ).orderBy("r_name", "rank_in_region", "n_name")


def q236_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning weekly actives — the product-analytics
    companion to q145's cohort retention: per ISO-truncated week,
    distinct actives split into NEW (first-ever activity that week —
    one min-ts aggregate per user, no self-join against history) and
    RETURNING, plus the new share in basis points of exact counts.
    Scale: one per-user min aggregate + one distinct (user, week)
    frame; both map-side combined."""
    ev = _t(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("first_week")
    )
    return (
        uw.join(first, "user_id")
        .groupBy("week")
        .agg(
            F.sum(F.when(F.col("week") == F.col("first_week"), 1).otherwise(0))
            .cast("long")
            .alias("new_users"),
            F.sum(F.when(F.col("week") != F.col("first_week"), 1).otherwise(0))
            .cast("long")
            .alias("returning_users"),
        )
        .select(
            "week",
            "new_users",
            "returning_users",
            F.round(
                F.lit(1e4)
                * F.col("new_users")
                / (F.col("new_users") + F.col("returning_users")),
                0,
            )
            .cast("long")
            .alias("new_share_bp"),
        )
        .orderBy("week")
    )


def q237_power_user_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-user concentration (the Pareto 80/20 check): events held
    by the top decile / quartile of users, by per-user event-count rank
    (count desc, user asc — a total order). One row per cut with the
    exact integer event share in basis points — the engagement-
    concentration number product teams quote. Scale: everything after
    the per-user count runs on the |users| frame, and the rank is the
    DISTRIBUTED global index (operators/indexing.global_index over
    (-n, user) — VERDICT r9 item 3: |users| grows with data, so an
    unpartitioned rank window would single-task it); the pin releases
    after the two-cut union materializes."""
    from pandas_streaming_spark.operators.indexing import global_index

    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(F.count("*").cast("long").alias("n"))
    gi = global_index(
        per.withColumn("__negn", -F.col("n")), ["__negn", "user_id"], "__i0"
    )
    ranked = gi.df.select(
        "n",
        (F.col("__i0") + 1).cast("long").alias("__r"),
    )
    tot = per.agg(
        F.sum("n").cast("long").alias("__tot"),
        F.count("*").cast("long").alias("__u"),
    )
    out = None
    for label, pct in (("top_10pct", 10), ("top_25pct", 25)):
        cut = (
            ranked.join(F.broadcast(tot))
            .filter(F.col("__r") * 100 <= F.col("__u") * pct)
            .agg(
                F.count("*").cast("long").alias("n_users"),
                F.sum("n").cast("long").alias("n_events"),
                F.round(
                    F.lit(1e4) * F.sum("n") / F.first("__tot"), 0
                )
                .cast("long")
                .alias("event_share_bp"),
            )
            .select(F.lit(label).alias("cut"), "n_users", "n_events",
                    "event_share_bp")
        )
        out = cut if out is None else out.unionByName(cut)
    out = out.orderBy("cut").localCheckpoint(eager=True)
    gi.release()
    return out


def q250_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort time-to-convert — the latency companion to q145's
    retention and q94's reach: per user, first signup and first
    STRICTLY-LATER purchase; conversion lag in whole minutes (exact
    integer: floor of the µs delta / 6e7); users cohorted by signup
    week. Graded per cohort week: signups, conversions, conversion
    rate in bp, and the discrete median / p90 lag via the shared q157
    cume_dist idiom over the |converted users| frame. Scale: two
    map-side-combined per-user min aggregates on one events scan, then
    everything runs on the |users| frame; the per-cohort percentile
    window partitions on the cohort key."""
    ev = _t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.unix_micros("ts"))
        ).alias("s_us"),
    )
    # first purchase AFTER the user's first signup (strictly later)
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.unix_micros("ts").alias("p_us"))
        .join(firsts.select("user_id", "s_us"), "user_id")
        .filter(F.col("s_us").isNotNull() & (F.col("p_us") > F.col("s_us")))
        .groupBy("user_id")
        .agg(F.min("p_us").alias("p_us"))
    )
    base = (
        firsts.filter(F.col("s_us").isNotNull())
        .select("user_id", "s_us")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.date_format(
                F.date_trunc(
                    "week", F.timestamp_micros(F.col("s_us"))
                ),
                "yyyy-MM-dd",
            ).alias("week"),
            F.floor((F.col("p_us") - F.col("s_us")) / 60_000_000)
            .cast("long")
            .alias("lag_min"),
        )
    )
    wcd = Window.partitionBy("week").orderBy("lag_min")
    lagged = base.filter(F.col("lag_min").isNotNull()).select(
        "week", "lag_min", F.cume_dist().over(wcd).alias("cd")
    )
    pct = lagged.groupBy("week").agg(
        F.min(F.when(F.col("cd") >= 0.5, F.col("lag_min"))).alias(
            "median_lag_min"
        ),
        F.min(F.when(F.col("cd") >= 0.9, F.col("lag_min"))).alias(
            "p90_lag_min"
        ),
    )
    counts = base.groupBy("week").agg(
        F.count("*").cast("long").alias("n_signups"),
        F.sum(F.when(F.col("lag_min").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_converted"),
    )
    return (
        counts.join(pct, "week", "left")
        .select(
            "week",
            "n_signups",
            "n_converted",
            F.round(F.lit(1e4) * F.col("n_converted") / F.col("n_signups"), 0)
            .cast("long")
            .alias("conv_bp"),
            "median_lag_min",
            "p90_lag_min",
        )
        .orderBy("week")
    )


def q256_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift/gains table — the model-evaluation staple (rank the
    population by a score, cut into deciles, read how much of the
    outcome the top deciles capture): score = per-user CLICK count
    (the engagement 'model'), outcome = purchase cents. Deciles come
    from the distributed global_index over (-score, user) and the q210
    floor-balanced NTILE formula generalized to k=10; per decile the
    exact outcome share and CUMULATIVE share in bp (running sum over
    the 10-row decile frame — a trivially small window). A useless
    score reads ~1000 bp per decile; the gap above that is the lift.
    Scale: two map-side-combined per-user aggregates + one range
    exchange for the rank; everything after is 10 rows."""
    from pandas_streaming_spark.operators.indexing import global_index

    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("score"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("cents"),
    )
    gi = global_index(
        per.withColumn("__negs", -F.col("score")), ["__negs", "user_id"], "__i"
    )
    n = gi.df.agg(F.count("*").cast("long").alias("__n"))
    r = F.col("__i")
    q = F.floor(F.col("__n") / 10).cast("long")
    rem = F.pmod(F.col("__n"), F.lit(10)).cast("long")
    dec = (
        F.when(r < rem * (q + 1), F.floor(r / (q + 1)))
        .otherwise(rem + F.floor((r - rem * (q + 1)) / q))
        + 1
    ).cast("long")
    per_dec = (
        gi.df.join(F.broadcast(n))
        .select(dec.alias("decile"), "score", "cents")
        .groupBy("decile")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
    )
    tot = per_dec.agg(F.sum("sum_cents").cast("long").alias("__tot"))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    out = (
        per_dec.join(F.broadcast(tot))
        .select(
            "decile",
            "n_users",
            "sum_cents",
            F.round(F.lit(1e4) * F.col("sum_cents") / F.col("__tot"), 0)
            .cast("long")
            .alias("share_bp"),
            F.round(
                F.lit(1e4) * F.sum("sum_cents").over(w) / F.col("__tot"), 0
            )
            .cast("long")
            .alias("cum_share_bp"),
        )
        .orderBy("decile")
        .localCheckpoint(eager=True)
    )
    gi.release()
    return out


def q260_fulfillment_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-fulfillment SLA table — the operational latency readout
    (how long from order placement to FIRST shipment, by priority
    class): per order the min lineitem shipdate, lag in whole days
    (exact integer datediff), then per priority the discrete
    median/p90 lag via the shared q157 cume_dist idiom plus the share
    shipped within 7 days in bp. The per-order min is one
    map-side-combined aggregate co-partitioned with the join; the
    percentile window partitions on the 5-value priority key over the
    |orders| frame — the data-reduced grain this report is defined on
    (the q157 precedent; a billion-order run would swap in the q118
    sketch contract). All integers until the two rounded shares."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.to_date("o_orderdate").alias("od")
    )
    first_ship = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.min(F.to_date("l_shipdate")).alias("sd"))
    )
    lag = (
        o.join(first_ship, o["o_orderkey"] == first_ship["l_orderkey"])
        .select(
            "o_orderpriority",
            F.datediff("sd", "od").cast("long").alias("lag_days"),
        )
    )
    wcd = Window.partitionBy("o_orderpriority").orderBy("lag_days")
    return (
        lag.select(
            "o_orderpriority", "lag_days", F.cume_dist().over(wcd).alias("cd")
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.min(F.when(F.col("cd") >= 0.5, F.col("lag_days"))).alias(
                "median_lag_days"
            ),
            F.min(F.when(F.col("cd") >= 0.9, F.col("lag_days"))).alias(
                "p90_lag_days"
            ),
            F.round(
                F.lit(1e4)
                * F.sum(F.when(F.col("lag_days") <= 7, 1).otherwise(0))
                / F.count("*"),
                0,
            )
            .cast("long")
            .alias("within_7d_bp"),
        )
        .orderBy("o_orderpriority")
    )


def q264_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification — the inventory-analytics standard:
    parts ranked by discounted revenue; A = parts whose cumulative share
    stays within 80% of total revenue, B = within 95%, C = the tail.
    Class boundaries compare EXACT integers by cross-multiplication
    (cum·100 vs tot·80/95 — per-row-rounded cents, the q134/10x-axis
    rule, so no float touches membership). Graded per class: parts,
    revenue cents, share in bp. Scale: one map-side-combined per-part
    aggregate reduces the fact scan to the |parts| frame; the cumulative
    window then runs over that DATA-REDUCED frame (the q215 posture —
    parts are thousands-of-times fewer than lineitems; a 100 TB run
    would two-phase the cut like q210 if |parts| itself outgrew one
    task)."""
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
            ).cast("long")
        ).alias("rev_cents")
    )
    tot = rev.agg(F.sum("rev_cents").cast("long").alias("__tot"))
    w = Window.orderBy(F.col("rev_cents").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = rev.select(
        "l_partkey", "rev_cents", F.sum("rev_cents").over(w).alias("__cum")
    ).join(F.broadcast(tot))
    cls = (
        F.when(F.col("__cum") * 100 <= F.col("__tot") * 80, "A")
        .when(F.col("__cum") * 100 <= F.col("__tot") * 95, "B")
        .otherwise("C")
    )
    return (
        ranked.select(cls.alias("abc_class"), "rev_cents", "__tot")
        .groupBy("abc_class")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.sum("rev_cents").cast("long").alias("rev_cents"),
            F.round(F.lit(1e4) * F.sum("rev_cents") / F.first("__tot"), 0)
            .cast("long")
            .alias("share_bp"),
        )
        .orderBy("abc_class")
    )


QUERIES = {
    "q250_time_to_convert": q250_time_to_convert,
    "q264_abc_classification": q264_abc_classification,
    "q260_fulfillment_sla": q260_fulfillment_sla,
    "q256_decile_lift": q256_decile_lift,
    "q195_funnel_window": q195_funnel_window,
    "q210_rfm_segments": q210_rfm_segments,
    "q212_share_of_parent": q212_share_of_parent,
    "q213_yoy_revenue": q213_yoy_revenue,
    "q236_new_vs_returning": q236_new_vs_returning,
    "q237_power_user_share": q237_power_user_share,
    "q184_incremental_mv": q184_incremental_mv,
    "q163_bitmap_distinct": q163_bitmap_distinct,
    "q161_zorder_skipping": q161_zorder_skipping,
    "q143_rollup_reuse": q143_rollup_reuse,
    "q144_weighted_sample": q144_weighted_sample,
    "q145_cohort_retention": q145_cohort_retention,
    "q147_upsert_time_travel": q147_upsert_time_travel,
    "q148_upsert_changes": q148_upsert_changes,
    "q149_scd2_history": q149_scd2_history,
    "q150_path_transitions": q150_path_transitions,
    "q152_interval_overlap": q152_interval_overlap,
    "q153_cume_dist_share": q153_cume_dist_share,
    "q154_gaps_islands": q154_gaps_islands,
    "q157_percentile_disc": q157_percentile_disc,
}

ORACLES = {
    # same per-row cents, same (rev desc, partkey) cumulative order,
    # same cross-multiplied 80/95 boundaries
    "q264_abc_classification": """
WITH rev AS (
  SELECT l_partkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                       AS BIGINT)) AS BIGINT) AS rev_cents
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT CAST(SUM(rev_cents) AS BIGINT) AS t FROM rev),
ranked AS (
  SELECT rev_cents,
         CAST(SUM(rev_cents) OVER (ORDER BY rev_cents DESC, l_partkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum
  FROM rev
),
cls AS (
  SELECT CASE WHEN cum * 100 <= tot.t * 80 THEN 'A'
              WHEN cum * 100 <= tot.t * 95 THEN 'B'
              ELSE 'C' END AS abc_class,
         rev_cents, tot.t AS t
  FROM ranked, tot
)
SELECT abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(rev_cents) AS BIGINT) AS rev_cents,
       CAST(ROUND(1e4 * SUM(rev_cents) / ANY_VALUE(t), 0) AS BIGINT)
         AS share_bp
FROM cls GROUP BY abc_class ORDER BY abc_class
""",
    # same per-order min shipdate, integer day lag, cume_dist discretes
    "q260_fulfillment_sla": """
WITH fs AS (
  SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS sd
  FROM lineitem GROUP BY l_orderkey
),
lag AS (
  SELECT o.o_orderpriority,
         CAST(DATEDIFF('day', CAST(o.o_orderdate AS DATE), fs.sd)
              AS BIGINT) AS lag_days
  FROM orders o JOIN fs ON fs.l_orderkey = o.o_orderkey
),
cd AS (
  SELECT o_orderpriority, lag_days,
         CUME_DIST() OVER (PARTITION BY o_orderpriority
                           ORDER BY lag_days) AS cd
  FROM lag
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       MIN(CASE WHEN cd >= 0.5 THEN lag_days END) AS median_lag_days,
       MIN(CASE WHEN cd >= 0.9 THEN lag_days END) AS p90_lag_days,
       CAST(ROUND(1e4 * SUM(CASE WHEN lag_days <= 7 THEN 1 ELSE 0 END)
                  / COUNT(*), 0) AS BIGINT) AS within_7d_bp
FROM cd
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    # same first-signup / first-later-purchase mins, whole-minute floor
    # lag, Monday-truncated weeks, cume_dist-discrete percentiles
    # NTILE(10) over (-score, user) matches the global_index formula;
    # cumulative share over the 10-row decile frame
    "q256_decile_lift": """
WITH per AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS score,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(ROUND(value * 100, 0) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS cents
  FROM events GROUP BY user_id
),
d AS (
  SELECT CAST(NTILE(10) OVER (ORDER BY -score, user_id) AS BIGINT)
           AS decile,
         cents
  FROM per
),
pd AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(cents) AS BIGINT) AS sum_cents
  FROM d GROUP BY decile
),
t AS (SELECT CAST(SUM(sum_cents) AS BIGINT) AS tot FROM pd)
SELECT decile, n_users, sum_cents,
       CAST(ROUND(1e4 * sum_cents / t.tot, 0) AS BIGINT) AS share_bp,
       CAST(ROUND(1e4 * SUM(sum_cents) OVER (ORDER BY decile
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / t.tot, 0)
            AS BIGINT) AS cum_share_bp
FROM pd CROSS JOIN t
ORDER BY decile
""",
    "q250_time_to_convert": """
WITH f AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN EPOCH_US(ts) END) AS s_us
  FROM events GROUP BY user_id
),
p AS (
  SELECT e.user_id, MIN(EPOCH_US(e.ts)) AS p_us
  FROM events e JOIN f ON f.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND f.s_us IS NOT NULL
    AND EPOCH_US(e.ts) > f.s_us
  GROUP BY e.user_id
),
base AS (
  SELECT f.user_id,
         STRFTIME(DATE_TRUNC('week', make_timestamp(f.s_us)),
                  '%Y-%m-%d') AS week,
         CAST(FLOOR((p.p_us - f.s_us) / 60000000.0) AS BIGINT) AS lag_min
  FROM f LEFT JOIN p USING (user_id)
  WHERE f.s_us IS NOT NULL
),
pct AS (
  SELECT week,
         MIN(CASE WHEN cd >= 0.5 THEN lag_min END) AS median_lag_min,
         MIN(CASE WHEN cd >= 0.9 THEN lag_min END) AS p90_lag_min
  FROM (SELECT week, lag_min,
               CUME_DIST() OVER (PARTITION BY week ORDER BY lag_min) AS cd
        FROM base WHERE lag_min IS NOT NULL)
  GROUP BY week
),
counts AS (
  SELECT week, CAST(COUNT(*) AS BIGINT) AS n_signups,
         CAST(SUM(CASE WHEN lag_min IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_converted
  FROM base GROUP BY week
)
SELECT counts.week, n_signups, n_converted,
       CAST(ROUND(1e4 * n_converted / n_signups, 0) AS BIGINT) AS conv_bp,
       median_lag_min, p90_lag_min
FROM counts LEFT JOIN pct USING (week)
ORDER BY week
""",
    # first-week via one min aggregate; share of exact counts
    "q236_new_vs_returning": """
WITH uw AS (
  SELECT DISTINCT user_id, DATE_TRUNC('week', ts) AS week FROM events
), first AS (
  SELECT user_id, DATE_TRUNC('week', MIN(ts)) AS first_week
  FROM events GROUP BY user_id
), j AS (
  SELECT uw.week,
         CASE WHEN uw.week = f.first_week THEN 1 ELSE 0 END AS is_new
  FROM uw JOIN first f USING (user_id)
)
SELECT week,
       CAST(SUM(is_new) AS BIGINT) AS new_users,
       CAST(SUM(1 - is_new) AS BIGINT) AS returning_users,
       CAST(ROUND(1e4 * SUM(is_new) / COUNT(*), 0) AS BIGINT)
         AS new_share_bp
FROM j GROUP BY week ORDER BY week
""",
    # rank cut r*100 <= u*pct — integer predicate, shares of exact counts
    "q237_power_user_share": """
WITH per AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events
  GROUP BY user_id
), ranked AS (
  SELECT n, CAST(ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS BIGINT)
           AS r
  FROM per
), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS t, CAST(COUNT(*) AS BIGINT) AS u
  FROM per
)
SELECT cut, n_users, n_events, event_share_bp FROM (
  SELECT 'top_10pct' AS cut, CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(n) AS BIGINT) AS n_events,
         CAST(ROUND(1e4 * SUM(n) / MAX(tot.t), 0) AS BIGINT)
           AS event_share_bp
  FROM ranked, tot WHERE r * 100 <= tot.u * 10
  UNION ALL
  SELECT 'top_25pct', CAST(COUNT(*) AS BIGINT), CAST(SUM(n) AS BIGINT),
         CAST(ROUND(1e4 * SUM(n) / MAX(tot.t), 0) AS BIGINT)
  FROM ranked, tot WHERE r * 100 <= tot.u * 25
) ORDER BY cut
""",
    # two partition sums over the nation-grain aggregate; bp of exact cents
    "q212_share_of_parent": """
WITH rev AS (
  SELECT r.r_name, n.n_name,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, n.n_name
)
SELECT r_name, n_name, cents,
       CAST(ROUND(1e4 * cents / SUM(cents) OVER (PARTITION BY r_name), 0)
            AS BIGINT) AS region_share_bp,
       CAST(ROUND(1e4 * cents / SUM(cents) OVER (), 0) AS BIGINT)
         AS total_share_bp,
       CAST(RANK() OVER (PARTITION BY r_name ORDER BY cents DESC, n_name)
            AS BIGINT) AS rank_in_region
FROM rev ORDER BY r_name, rank_in_region, n_name
""",
    # NTILE under the same (metric, custkey) total order; both engines
    # use floor-balanced buckets
    "q210_rfm_segments": """
WITH per AS (
  SELECT o_custkey,
         MAX(CAST(o_orderdate AS DATE)) AS last_d,
         CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY o_custkey
), scored AS (
  SELECT o_custkey, cents,
         CAST(NTILE(4) OVER (ORDER BY last_d, o_custkey) AS BIGINT) AS r,
         CAST(NTILE(4) OVER (ORDER BY freq, o_custkey) AS BIGINT) AS f,
         CAST(NTILE(4) OVER (ORDER BY cents, o_custkey) AS BIGINT) AS m
  FROM per
)
SELECT r, f, m, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM scored GROUP BY r, f, m ORDER BY r, f, m
""",
    # month-minus-12 equi-join (gap-robust), bp ratio of exact cents
    "q213_yoy_revenue": """
WITH m AS (
  SELECT DATE_TRUNC('month', o_orderdate) AS month,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
)
SELECT m.month, m.cents, p.cents AS prev_cents,
       CASE WHEN p.cents IS NOT NULL
            THEN CAST(ROUND(1e4 * (m.cents - p.cents) / p.cents, 0) AS BIGINT)
       END AS yoy_bp
FROM m LEFT JOIN m p ON m.month = p.month + INTERVAL 12 MONTH
ORDER BY m.month
""",
    # definitional join-chain form; epoch_us comparison mirrors the
    # engine's integer-microsecond window predicate exactly
    "q195_funnel_window": """
WITH t1 AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), t2 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e
  JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'view' AND e.ts > t1.t
    AND epoch_us(e.ts) <= epoch_us(t1.t) + 86400000000
  GROUP BY e.user_id
), t3 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e
  JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'click' AND e.ts > t2.t
    AND epoch_us(e.ts) <= epoch_us(t2.t) + 86400000000
  GROUP BY e.user_id
), t4 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e
  JOIN t3 ON e.user_id = t3.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t3.t
    AND epoch_us(e.ts) <= epoch_us(t3.t) + 86400000000
  GROUP BY e.user_id
)
SELECT 1 AS stage_no, 'signup' AS stage, (SELECT COUNT(*) FROM t1) AS n_users
UNION ALL
SELECT 2, 'view', (SELECT COUNT(*) FROM t2)
UNION ALL
SELECT 3, 'click', (SELECT COUNT(*) FROM t3)
UNION ALL
SELECT 4, 'purchase', (SELECT COUNT(*) FROM t4)
ORDER BY stage_no
""",
    "q184_incremental_mv": """
WITH c AS (
  SELECT o_orderpriority,
         STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m') AS month,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT o_orderpriority, month,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       CAST(MIN(cents) AS BIGINT) AS min_cents,
       CAST(MAX(cents) AS BIGINT) AS max_cents,
       CAST((SUM(cents) * 10000) // COUNT(*) AS BIGINT) AS avg_cents_e4
FROM c GROUP BY o_orderpriority, month
ORDER BY o_orderpriority, month
""",
    "q163_bitmap_distinct": """
SELECT o_orderpriority, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
FROM orders GROUP BY o_orderpriority
UNION ALL
SELECT 'TOTAL', CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders
ORDER BY o_orderpriority
""",
    "q161_zorder_skipping": """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events
WHERE user_id BETWEEN 100 AND 260
  AND ts >= TIMESTAMP '2024-01-10 00:00:00'
  AND ts < TIMESTAMP '2024-01-13 00:00:00'
GROUP BY event_type
ORDER BY event_type
""",
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
    "q147_upsert_time_travel": """
WITH ranked AS (
  -- the replay split is by event-TIME rank (round 7, replay.py v2 rule:
  -- floor(rank(ts, event_id) * k / n)), not by id arithmetic
  SELECT *, ROW_NUMBER() OVER (ORDER BY ts, event_id) - 1 AS rnk
  FROM events
),
prefix AS (
  SELECT * FROM ranked
  WHERE rnk * 5 < 2 * (SELECT COUNT(*) FROM events)
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
    "q148_upsert_changes": """
WITH ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY ts, event_id) - 1 AS rnk
  FROM events
),
pre AS (
  SELECT user_id, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM ranked
  WHERE rnk * 5 < 2 * (SELECT COUNT(*) FROM events)
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
}
