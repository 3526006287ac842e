"""Q43–Q48: Structured Streaming surface, graded on FINAL STATE
(SURVEY.md §2.5/§2.10, FIXTURES.md replay protocol).

Each query replays the events table as k=5 in-order micro-batches through
a real streaming query (file source, maxFilesPerTrigger=1, availableNow)
and returns the final state as a batch DataFrame; the duckdb oracle is the
equivalent one-shot batch SQL. This encodes the reference's core
invariant — batch-split invariance: streaming over any split must equal
the batch computation (tests/ additionally check k ∈ {1, 5, 20}).

Scale: all operators are state-store-backed built-ins (windowed agg,
dedup-with-watermark, stream-static join) or applyInPandasWithState; on a
cluster the state store shards by key across executors (RocksDB provider
for large state), and watermarks bound state growth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_streaming_spark.catalog import load_table
from pandas_streaming_spark.operators.stateful import running_user_stats
from pandas_streaming_spark.operators.text import max_token_multiplicity
from pandas_streaming_spark.streaming.replay import (
    replay_events,
    run_stream_to_df,
    write_replay_batches,
)

K_BATCHES = 5

#: state-store partition count for the replay queries. Their state is
#: small (≲ thousands of keys at any tested SF) and EVERY trigger commits
#: EVERY state partition, so matching the session's 32 shuffle partitions
#: paid 32 near-empty store commits per micro-batch — the dominant term
#: in the replay's wall time (scripts/profile_streaming.py: per-trigger
#: cost 1.02 s at 32 partitions; 32→4 took the k=5 tumbling replay from
#: 6.2 s to 2.7 s for identical results, and 4→1 shaves another ~10%
#: at sf0.1 where even the stream-stream joins hold ≤2×100k state rows).
#: At real scale size this to state volume, not a constant.
STATE_PARTITIONS = 1


def jvm_state_partitions(sf_dir: str) -> int:
    """SIZE-ADAPTIVE JVM-state partition count (round 11, closing the
    constant above's own caveat — "at real scale size this to state
    volume"): 1 partition is optimal while the per-trigger store commit
    dominates (every tested SF: ≤100k events/replay), but a 100× replay
    pushes ~2M events per trigger through the join/window state — one
    partition serializes that work onto a single core (measured q165 at
    100×: 409 s). Scale by event volume (footer-only row count, no data
    read): one partition per ~300k events, capped at the session's core
    count. Round 12 re-calibrated BOTH constants (VERDICT r11 item 5
    asked where the old min(8, n//1.5M) cap should move): q165 at the
    10M-event replica ran 110 s at the old formula's 6 partitions, 59 s
    forced to 16, 48.5 s at 32 (= cores — the knee is the core count,
    not 8; the PY_STATE_PARTITIONS knee does NOT transfer to JVM state,
    whose per-partition commit is far cheaper than a Python fold
    round-trip), and at the 1M-event replica 26.4 s at the old
    formula's 1 partition vs 16.7 s at 4 — identical 292-row results
    throughout. Results are partition-count-invariant (the forced-4
    invariance test and the shared batch oracles pin this); at every
    graded SF (≤100k events) this still returns 1, so graded plans are
    unchanged. On a real cluster the cap is total executor cores.

    The footer scan is memoized per sf_dir (it runs on every streaming
    query build otherwise), and a corrupt/truncated footer — pyarrow
    raises ``ArrowInvalid``, a ``ValueError`` subclass, NOT ``OSError``
    — falls back to STATE_PARTITIONS instead of crashing the query."""
    import glob as _glob
    import os as _os

    forced = _os.environ.get("SPARK_GRAFT_JVM_STATE_PARTITIONS")
    if forced:  # probe/bench knob; graded runs never set it
        return int(forced)
    cached = _JVM_STATE_PARTITIONS_CACHE.get(sf_dir)
    if cached is not None:
        return cached

    import pyarrow.parquet as _pq

    path = _os.path.join(sf_dir, "events.parquet")
    try:
        files = (
            sorted(_glob.glob(_os.path.join(path, "*.parquet")))
            if _os.path.isdir(path)
            else [path]
        )
        n = sum(_pq.read_metadata(f).num_rows for f in files)
    except (OSError, ValueError):
        return STATE_PARTITIONS
    cpus = int(_os.environ.get("SPARK_GRAFT_CPUS", "0")) or (_os.cpu_count() or 8)
    out = max(STATE_PARTITIONS, min(cpus, n // 300_000))
    _JVM_STATE_PARTITIONS_CACHE[sf_dir] = out
    return out


_JVM_STATE_PARTITIONS_CACHE: dict = {}

#: state partitions for PYTHON-stateful operators
#: (applyInPandasWithState / transformWithStateInPandas). Their
#: per-trigger cost is dominated by the per-KEY Python fold invocation
#: (~4 ms each: Arrow exchange + state round-trip), NOT the store
#: commit that makes 1 optimal for JVM-state queries — so the fold
#: must parallelize across workers. Measured on q229 at sf0.1 (1.5k
#: keys × 5 triggers): 1 → 32.1 s, 4 → 12.1 s, 8 → 7.4 s, 16 → 7.7 s
#: (commit overhead re-enters) — 8 is the knee. Results are
#: partition-count-invariant (the k∈{1,20} split-invariance tests and
#: the shared batch oracles pin it).
PY_STATE_PARTITIONS = 8

#: state partitions for the CATCH-UP replay shape (no per-file trigger
#: cap — one availableNow trigger over the whole backlog). With all
#: ~100k sf0.1 events in a single batch the state update is the
#: bottleneck, not the per-trigger commit count: measured medians at
#: sf0.1, 1 partition = 78k ev/s, 2 = 101k, 4 = 112k, 8 = 95k (commit
#: overhead wins again). Results are partition-count-invariant
#: (test_stream_catchup_equals_protocol).
CATCHUP_STATE_PARTITIONS = 4


def _final(
    spark: SparkSession,
    sf_dir: str,
    transform,
    output_mode: str,
    key_cols: list[str] | None = None,
    dup_every: int | None = None,
    max_files_per_trigger: int | None = 1,
    state_partitions: int | None = None,
):
    # content-keyed cached split (persists in .scratch; shared by all
    # streaming queries at this sf/k)
    replay_dir = write_replay_batches(spark, sf_dir, K_BATCHES, dup_every=dup_every)
    stream = replay_events(
        spark, sf_dir, replay_dir, max_files_per_trigger=max_files_per_trigger
    )
    # one micro-batch per split file (maxFilesPerTrigger=1): the last
    # batch id is known, so complete-mode runs skip the k-1 redundant
    # full-state rewrites (run_stream_to_df final_batch_id fast path)
    import glob as _glob
    import os as _os

    n_files = len(_glob.glob(_os.path.join(replay_dir, "batch_*.parquet")))
    return run_stream_to_df(
        spark, transform(stream), output_mode, key_cols,
        state_partitions=(
            state_partitions
            if state_partitions is not None
            else jvm_state_partitions(sf_dir)
            if max_files_per_trigger is not None
            else CATCHUP_STATE_PARTITIONS
        ),
        final_batch_id=(n_files - 1) if output_mode == "complete" else None,
    )


def q43_stream_tumbling(
    spark: SparkSession, sf_dir: str, *, catchup: bool = False
) -> DataFrame:
    """``catchup=True`` (bench-only knob, not the graded path) replays the
    SAME k=5 split without the one-file-per-trigger cap: availableNow
    batches the backlog into as few triggers as it admits. Trigger-
    batching invariance is pinned by test_stream_catchup_equals_protocol;
    the graded registry entry always runs the 5-trigger protocol."""

    def transform(stream: DataFrame) -> DataFrame:
        return (
            stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
            .select(
                F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("w_start"),
                "event_type",
                "n",
                "sv",
            )
        )

    out = _final(
        spark, sf_dir, transform, "complete",
        max_files_per_trigger=None if catchup else 1,
    )
    return (
        out.select(
            "w_start", "event_type", "n", F.round("sv", 2).alias("sum_value")
        )
        .orderBy("w_start", "event_type")
    )


def q44_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    def transform(stream: DataFrame) -> DataFrame:
        return (
            stream.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
            .agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
            .select(
                F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("w_start"),
                "n",
                "sv",
            )
        )

    out = _final(spark, sf_dir, transform, "complete")
    return out.select("w_start", "n", F.round("sv", 2).alias("sum_value")).orderBy(
        "w_start"
    )


def q45_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    def transform(stream: DataFrame) -> DataFrame:
        return (
            stream.groupBy(
                F.session_window("ts", "30 minutes").alias("w"), "user_id"
            )
            .agg(F.count("*").alias("n_events"))
        )

    out = _final(spark, sf_dir, transform, "complete")
    return (
        out.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
            F.max("n_events").cast("long").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


def q46_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay with every-37th row duplicated into the next batch; watermark
    + dropDuplicates must converge to the batch-distinct count."""

    def transform(stream: DataFrame) -> DataFrame:
        return stream.withWatermark("ts", "1 hour").dropDuplicates(["event_id"])

    out = _final(spark, sf_dir, transform, "append", dup_every=37)
    return out.agg(
        F.count("*").alias("n_events"),
        F.countDistinct("event_id").alias("n_unique"),
    )


def q119_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's ``dropDuplicatesWithinWatermark`` on the q46 replay
    (every-37th row re-injected into the NEXT micro-batch): unlike plain
    ``dropDuplicates``, state for a key is dropped once the watermark
    passes it — the production form when duplicates are known to arrive
    within a bounded delay, because state stays bounded by the watermark
    horizon instead of growing with distinct keys forever. The injected
    dups land one batch (≪ 1 h of event time) later, inside the
    watermark window, so the final state must equal q46's batch-distinct
    oracle exactly."""

    def transform(stream: DataFrame) -> DataFrame:
        return stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
            ["event_id"]
        )

    out = _final(spark, sf_dir, transform, "append", dup_every=37)
    return out.agg(
        F.count("*").alias("n_events"),
        F.countDistinct("event_id").alias("n_unique"),
    )


def q47_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    dim = (
        customer.groupBy((F.col("c_custkey") % 20).cast("long").alias("user_id"))
        .agg(F.count("*").alias("n_cust"))
    )

    def transform(stream: DataFrame) -> DataFrame:
        return (
            stream.join(F.broadcast(dim), "user_id")
            .groupBy("user_id")
            .agg(
                F.count("*").alias("n_events"),
                F.max("n_cust").alias("n_cust"),
                F.sum("value").alias("sv"),
            )
        )

    out = _final(spark, sf_dir, transform, "complete")
    return (
        out.select(
            "user_id", "n_events", "n_cust", F.round("sv", 2).alias("sum_value")
        )
        .orderBy("user_id")
    )


def q48_stateful_accumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _final(
        spark, sf_dir, running_user_stats, "update", key_cols=["user_id"],
        state_partitions=PY_STATE_PARTITIONS,
    )
    return out.select("user_id", "n_events", "max_value").orderBy("user_id")


def q60_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time-bounded stream-stream self-join (§2.3): each purchase
    joined to the same user's clicks in the preceding hour. Both sides
    are independent streaming readers over the same replay; watermarks
    bound the join state. Final appended matches equal the batch
    interval join."""
    from pandas_streaming_spark.streaming.joins import interval_join

    replay_dir = write_replay_batches(spark, sf_dir, K_BATCHES)
    purchases = replay_events(spark, sf_dir, replay_dir).filter(
        F.col("event_type") == "purchase"
    )
    clicks = replay_events(spark, sf_dir, replay_dir).filter(
        F.col("event_type") == "click"
    )
    joined = interval_join(
        purchases,
        clicks,
        key="user_id",
        left_time="ts",
        right_time="ts",
        lookback="1 HOUR",
        watermark="2 hours",
    ).select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.event_id").alias("purchase_id"),
        F.col("r.event_id").alias("click_id"),
    )
    out = run_stream_to_df(
        spark, joined, "append", state_partitions=jvm_state_partitions(sf_dir)
    )
    return (
        out.groupBy("user_id")
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("purchase_id").alias("n_purchases_with_click"),
        )
        .orderBy("user_id")
    )


def q71_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer event-time stream-stream join (§2.3): every purchase,
    with NULL click columns when no same-user click precedes it within an
    hour. Outer rows only emit once the watermark passes the purchase's
    horizon, so the replay appends a far-future flush-sentinel batch
    (write_replay_batches(sentinel=True)) — the same trick a production
    pipeline uses to drain a finite backfill through an outer join."""
    from pandas_streaming_spark.streaming.joins import interval_join
    from pandas_streaming_spark.streaming.replay import SENTINEL_USER

    replay_dir = write_replay_batches(spark, sf_dir, K_BATCHES, sentinel=True)
    purchases = replay_events(spark, sf_dir, replay_dir).filter(
        F.col("event_type") == "purchase"
    )
    clicks = replay_events(spark, sf_dir, replay_dir).filter(
        F.col("event_type") == "click"
    )
    joined = interval_join(
        purchases,
        clicks,
        key="user_id",
        left_time="ts",
        right_time="ts",
        lookback="1 HOUR",
        watermark="2 hours",
        how="leftOuter",
    ).select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.event_id").alias("purchase_id"),
        F.col("r.event_id").alias("click_id"),
    )
    out = run_stream_to_df(
        spark, joined, "append", state_partitions=jvm_state_partitions(sf_dir)
    )
    return (
        out.filter(F.col("user_id") != SENTINEL_USER)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("click_id").alias("n_matched"),
            F.sum(
                F.when(F.col("click_id").isNull(), 1).otherwise(0)
            ).cast("long").alias("n_unmatched"),
        )
        .orderBy("user_id")
    )


def q72_stream_ewm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjusted exponentially-weighted mean per user over the replayed
    stream (pandas ewm(alpha=0.5, adjust=True) semantics), carried as
    (num, den) state so any batch split is invariant. Oracle: a duckdb
    recursive CTE running the same fold — both sides execute the identical
    IEEE op sequence (num*decay + v), so values agree bit-for-bit; the
    comparison still uses floor-to-micro-units per the repo's
    determinism rules."""
    from pandas_streaming_spark.operators.stateful import ewm_stream

    out = _final(
        spark, sf_dir, lambda s: ewm_stream(s, alpha=0.5), "append",
        state_partitions=PY_STATE_PARTITIONS,
    )
    return out.select(
        "user_id",
        "event_id",
        F.floor(F.col("ewm_value") * 1e6 + F.lit(0.5)).cast("long").alias("ewm_e6"),
    ).orderBy("user_id", "event_id")


FUNNEL_STAGES = ["signup", "view", "click", "purchase"]


def q229_stream_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CUSUM drift detection (operators.stateful.cusum_stream):
    q219's batch statistic maintained live — per-user saturating drift
    sums with alarm/reset accounting, state = five longs per key. The
    oracle is SHARED VERBATIM with q219 (the definitional recursive
    CTE), pinning streaming-vs-batch equivalence exactly like the
    q94/q98 funnel pair."""
    from pandas_streaming_spark.operators.stateful import cusum_stream

    return _final(
        spark,
        sf_dir,
        lambda s: cusum_stream(
            s.filter(F.col("event_type") == "purchase")
        ),
        "update",
        key_cols=["user_id"],
        state_partitions=PY_STATE_PARTITIONS,
    ).orderBy("user_id")


def q98_stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming conversion funnel (operators.stateful.funnel_stream):
    a per-user state machine advances stage-by-stage on strictly-later
    qualifying events; final per-user reached-stage counts aggregate to
    the SAME per-stage reach table as the batch q94_funnel — the oracle
    is shared verbatim, pinning streaming-vs-batch equivalence."""
    from pandas_streaming_spark.operators.stateful import funnel_stream

    out = _final(
        spark,
        sf_dir,
        lambda s: funnel_stream(s, FUNNEL_STAGES),
        "update",
        key_cols=["user_id"],
        state_partitions=PY_STATE_PARTITIONS,
    )
    reached = out.filter(F.col("n_stages") >= 1).select(
        F.explode(F.sequence(F.lit(1), F.col("n_stages"))).alias("stage_no")
    )
    counts = reached.groupBy("stage_no").agg(F.count("*").alias("__n"))
    stage_tbl = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(FUNNEL_STAGES)], "stage_no int, stage string"
    )
    return (
        stage_tbl.join(counts, "stage_no", "left")
        .select(
            "stage_no",
            "stage",
            F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias("n_users"),
        )
        .orderBy("stage_no")
    )


def q101_stream_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming trending: per tumbling hour, the top-2 event types by
    count — a windowed state-store aggregation whose final state gets a
    batch rank-and-filter (the continuous 'what's hot right now' query).
    At scale the rank runs per window partition inside foreachBatch on
    the complete-mode output; here it runs on the drained final state."""
    from pyspark.sql import Window

    def transform(stream: DataFrame) -> DataFrame:
        return (
            stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n"))
            .select(
                F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("w_start"),
                "event_type",
                "n",
            )
        )

    out = _final(spark, sf_dir, transform, "complete")
    w = Window.partitionBy("w_start").orderBy(F.desc("n"), "event_type")
    return (
        out.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 2)
        .select("w_start", "event_type", F.col("n").cast("long").alias("n"), "rnk")
        .orderBy("w_start", "rnk")
    )


def q117_stream_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key trailing-5-row window aggregates over the stream
    (operators/stateful.py rolling_window_stream — the reference's
    ``sdf.window(n=K)`` with retraction), graded against the batch
    ``ROWS BETWEEN 4 PRECEDING AND CURRENT ROW`` frame. Values are
    pre-rounded to integer cents so every window sum is a sum of
    integer-valued doubles — exact in ANY accumulation order, which is
    what makes a float window hash-gradable across engines."""
    from pandas_streaming_spark.operators.stateful import rolling_window_stream

    def transform(stream: DataFrame) -> DataFrame:
        cents = stream.withColumn("value", F.round(F.col("value") * 100, 0))
        return rolling_window_stream(cents, n=5)

    out = _final(spark, sf_dir, transform, "append", key_cols=["user_id"],
                 state_partitions=PY_STATE_PARTITIONS)
    return (
        out.select(
            "user_id",
            "event_id",
            F.col("win_sum").cast("long").alias("win_sum_cents"),
            F.col("win_count").cast("long").alias("win_count"),
        )
        .orderBy("user_id", "event_id")
    )


def q121_tws_session_timers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVENT-TIME TIMERS on transformWithStateInPandas
    (operators/stateful.py session_flush_tws): gap-sessionization where
    mid-stream sessions flush inline and the TRAILING session per user
    is finalized by a per-key timer when the watermark passes
    ``last_event + gap`` — the capability only timers provide (no later
    row exists to react to). The sentinel replay batch advances the
    watermark past every timer so a finite backfill drains completely.
    Grades against the q45 session_window oracle verbatim: same 30-min
    gap, same touching-merge boundary."""
    from pandas_streaming_spark.operators.stateful import session_flush_tws
    from pandas_streaming_spark.streaming.replay import SENTINEL_USER

    replay_dir = write_replay_batches(spark, sf_dir, K_BATCHES, sentinel=True)
    stream = replay_events(spark, sf_dir, replay_dir)
    sessions = session_flush_tws(stream, gap_minutes=30, watermark="1 hour")
    out = run_stream_to_df(
        spark, sessions, "append", state_partitions=PY_STATE_PARTITIONS
    )
    return (
        out.filter(F.col("user_id") != SENTINEL_USER)
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
            F.max("n_events").cast("long").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


def q111_stateful_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q48's per-user running (count, max(value)) on the
    ``transformWithStateInPandas`` API (operators/stateful.py
    ``running_user_stats_tws``: typed state handles, RocksDB column
    families — Spark 4's successor arbitrary-state operator and the
    preferred form at 100× state scale). Graded against the q48 batch
    GROUP BY oracle VERBATIM, the same streaming-vs-batch equivalence
    pin q98 uses against q94 (VERDICT r4 item 3)."""
    from pandas_streaming_spark.operators.stateful import running_user_stats_tws

    out = _final(
        spark, sf_dir, running_user_stats_tws, "update", key_cols=["user_id"],
        state_partitions=PY_STATE_PARTITIONS,
    )
    return out.select("user_id", "n_events", "max_value").orderBy("user_id")


def q142_stream_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL-outer event-time stream-stream join — the last §2.3 join
    shape (q60 inner, q71 left-outer): every purchase AND every click,
    matched where a click precedes the purchase within an hour, NULLs on
    whichever side has no partner. Unmatched rows on BOTH sides emit
    only when the watermark passes their horizon, so the replay appends
    the far-future flush sentinel; the batch oracle is duckdb's FULL
    OUTER interval join. State: per-key rows inside the 1h bound ×
    2h watermark — evictable on both sides, independent of stream
    length."""
    from pandas_streaming_spark.streaming.joins import interval_join
    from pandas_streaming_spark.streaming.replay import SENTINEL_USER

    replay_dir = write_replay_batches(spark, sf_dir, K_BATCHES, sentinel=True)
    purchases = replay_events(spark, sf_dir, replay_dir).filter(
        F.col("event_type") == "purchase"
    )
    clicks = replay_events(spark, sf_dir, replay_dir).filter(
        F.col("event_type") == "click"
    )
    joined = interval_join(
        purchases,
        clicks,
        key="user_id",
        left_time="ts",
        right_time="ts",
        lookback="1 HOUR",
        watermark="2 hours",
        how="fullOuter",
    ).select(
        F.coalesce(F.col("l.user_id"), F.col("r.user_id")).alias("user_id"),
        F.col("l.event_id").alias("purchase_id"),
        F.col("r.event_id").alias("click_id"),
    )
    out = run_stream_to_df(
        spark, joined, "append", state_partitions=jvm_state_partitions(sf_dir)
    )
    return (
        out.filter(F.col("user_id") != SENTINEL_USER)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(
                F.when(
                    F.col("purchase_id").isNotNull()
                    & F.col("click_id").isNotNull(),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_both"),
            F.sum(F.when(F.col("click_id").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_purchase_only"),
            F.sum(F.when(F.col("purchase_id").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_click_only"),
        )
        .orderBy("user_id")
    )


def q155_stream_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming distinct-count sketch: HLL registers maintained BY the
    stream (update-mode max per (event_type, bucket) — max is the HLL
    merge, so the state store IS the sketch: ≤64 rows per group
    forever), estimated from the final state. Because the register
    construction is engine-exact (q141), the streaming result grades
    against the same duckdb register oracle — streaming ∘ sketch ≡
    batch ∘ sketch, the composition of the two invariants."""
    from pandas_streaming_spark.operators.sketches import hll_estimate, hll_registers

    def transform(stream: DataFrame) -> DataFrame:
        return hll_registers(stream, "user_id", "event_type")

    regs = _final(
        spark, sf_dir, transform, "update", key_cols=["event_type", "hll_bucket"]
    )
    est = hll_estimate(regs, "event_type")
    return est.select(
        "event_type", F.round("hll_est", 2).alias("hll_est")
    ).orderBy("event_type")


def q158_stream_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CMS twin of q155: a Count-Min grid maintained BY the stream.
    Count per (row, bucket) is the CMS merge (counts add), so an
    update-mode streaming count aggregation over the cell keys IS the
    sketch — state bounded at d×w rows forever. Final-state grid
    estimates the per-user event counts for the 10 busiest users;
    because the md5 grid is engine-exact (q135), the streaming estimate
    grades against the batch-constructed duckdb grid verbatim."""
    from pandas_streaming_spark.operators.sketches import (
        cms_bucket,
        cms_estimate,
    )

    DEPTH, WIDTH = 4, 128

    def transform(stream: DataFrame) -> DataFrame:
        cells = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("cms_row"),
                        cms_bucket(F.col("user_id"), r, WIDTH).alias("cms_col"),
                    )
                    for r in range(DEPTH)
                ]
            )
        ).alias("cell")
        return (
            stream.select(cells)
            .groupBy(
                F.col("cell.cms_row").alias("cms_row"),
                F.col("cell.cms_col").alias("cms_col"),
            )
            .agg(F.count("*").alias("cms_cnt"))
        )

    grid = _final(
        spark, sf_dir, transform, "update", key_cols=["cms_row", "cms_col"]
    )
    ev = load_table(spark, sf_dir, "events")
    top = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("true_cnt"))
        .orderBy(F.col("true_cnt").desc(), "user_id")
        .limit(10)
    )
    est = cms_estimate(top, grid, "user_id", depth=DEPTH, width=WIDTH)
    return est.select(
        "user_id",
        "true_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("true_cnt")).alias("overestimate"),
    ).orderBy(F.col("true_cnt").desc(), "user_id")


def q303_stream_ingest_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING ingest curation — the batch curation stages composed as
    ONE Structured Streaming query over a DOCUMENT stream (the shape a
    crawl-ingest pipeline actually runs: docs arrive continuously, gates
    and dedup apply per micro-batch, the corpus report updates
    incrementally): documents replayed in doc_id order (5 single-file
    micro-batches — write_doc_replay_batches, the q43 replay protocol on
    the documents table), Gopher gate battery (q185's five integer
    gates) as a stateless streaming filter, exact dedup on
    (source, md5(text)) via streaming dropDuplicates — keyed per source
    so the surviving row's attribution can NEVER depend on intra-batch
    arrival order — then a complete-mode per-source aggregate of unique
    passing docs and their tokens. Oracle: the same gates + per-source
    distinct-md5 counting in batch SQL (all data arrives, so streaming
    final state must equal the batch answer — the q43 grading
    contract). Scale: gates are a narrow map; dedup state is one key
    per distinct (source, text) — production would bound it with a
    watermark (q46/q119's within-watermark form) or an exact-dedup
    compaction; the aggregate is |sources| rows."""
    from pandas_streaming_spark.streaming.replay import (
        replay_docs,
        run_stream_to_df,
        write_doc_replay_batches,
    )

    replay_dir = write_doc_replay_batches(spark, sf_dir, 5)
    stream = replay_docs(spark, sf_dir, replay_dir)
    w = F.split("text", " ")
    gated = stream.select(
        "source",
        "text",
        F.size(w).alias("__n"),
        F.length(F.regexp_replace("text", " ", "")).alias("__sl"),
        F.size(F.array_distinct(w)).alias("__nd"),
        F.size(
            F.array_intersect(
                F.array_distinct(w),
                F.array(*[F.lit(s) for s in ("the", "a", "of", "to", "and")]),
            )
        ).alias("__ns"),
        max_token_multiplicity(w).alias("__mx"),
    ).filter(
        (F.col("__n") >= 30)
        & (F.col("__n") <= 10000)
        & (F.col("__sl") >= 3 * F.col("__n"))
        & (F.col("__sl") <= 10 * F.col("__n"))
        & (F.col("__nd") * 10 >= 3 * F.col("__n"))
        & (F.col("__ns") >= 2)
        & (F.col("__mx") * 5 <= F.col("__n"))
    )
    deduped = gated.withColumn("__h", F.md5("text")).dropDuplicates(
        ["source", "__h"]
    )
    agg = deduped.groupBy("source").agg(
        F.count("*").alias("n_unique_pass"),
        F.sum("__n").alias("n_tokens"),
    )
    out = run_stream_to_df(spark, agg, "complete", final_batch_id=4)
    return out.select(
        "source",
        F.col("n_unique_pass").cast("long").alias("n_unique_pass"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
    ).orderBy("source")


def q308_stream_neardup_dedup(
    spark: SparkSession, sf_dir: str, k: int = 5
) -> DataFrame:
    """STREAMING near-dup dedup — the banded-MinHash stage IN-STREAM
    (VERDICT r12 item 3: the last LLM-pipeline operator whose
    production (crawl-ingest) shape is streaming but whose engine form
    was batch-only; q303 does gates + EXACT dedup in-stream, this adds
    the near-dup stage): documents replayed in 5 doc_id-ordered
    micro-batches (q303's replay protocol), per-doc 8-component MinHash
    signature computed as a STATELESS row-local expression chain —
    digest array materialized once, Kirsch–Mitzenmacher h1 + i·h2
    minima via zip_with/array_min — because the batch operator's
    explode + min-aggregate would be a per-doc streaming aggregate
    (unbounded state for a map-shaped computation); then q50's exact
    4×2 banding (same integer family, same md5 band hash), and a
    transformWithStateInPandas BUCKET-CLAIM state keyed by
    (band, band_hash): the bucket keeps the smallest doc_id, every
    later doc landing in a claimed bucket is emitted once as a flagged
    near-dup candidate (operators/stateful.bucket_claim_tws —
    min-doc_id semantics, so the final flag set equals the batch
    answer under ANY batch split). Readout per source: corpus docs,
    flagged, kept, kept ppm — the streaming twin of q286's retention
    panel (production would sink the flag rows into the
    verified_pairs MERGE table for the exact-Jaccard verify pass;
    LSH proposes in-stream, the nightly verify disposes).

    NO max_bucket cap on either side: the batch cap bounds O(bucket²)
    PAIR enumeration, which the claim state never performs — flag cost
    is O(members) per bucket, state is O(1). Oracle: the full chain in
    SQL (3-shingles → KM minhash → 4×2 banding → doc_id > bucket min —
    the llm.py CTE family), so the in-stream signature expressions are
    graded bit-for-bit against first principles."""
    from pandas_streaming_spark.functions import shingles_of, tokens
    from pandas_streaming_spark.operators.stateful import bucket_claim_tws
    from pandas_streaming_spark.streaming.replay import (
        replay_docs,
        write_doc_replay_batches,
    )

    replay_dir = write_doc_replay_batches(spark, sf_dir, k)
    stream = replay_docs(spark, sf_dir, replay_dir)
    sh = stream.select(
        "doc_id", shingles_of(tokens("text"), 3).alias("__sh")
    ).filter(F.size("__sh") >= 1)
    digs = sh.select("doc_id", F.transform("__sh", F.md5).alias("__d"))
    hs = digs.select(
        "doc_id",
        F.transform(
            "__d", lambda d: F.conv(F.substring(d, 1, 7), 16, 10).cast("long")
        ).alias("__h1"),
        F.transform(
            "__d", lambda d: F.conv(F.substring(d, 8, 7), 16, 10).cast("long")
        ).alias("__h2"),
    )
    sig = hs.select(
        "doc_id",
        *[
            F.array_min(
                F.zip_with("__h1", "__h2", lambda a, b: a + F.lit(i) * b)
            ).alias(f"__mh{i}")
            for i in range(8)
        ],
    )
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).cast("int").alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                F.col(f"__mh{2 * b}"),
                                F.col(f"__mh{2 * b + 1}"),
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("__b"),
    ).select(
        F.col("__b.band").alias("band"),
        F.col("__b.band_hash").alias("band_hash"),
        "doc_id",
    )
    flagged = bucket_claim_tws(banded)
    out = run_stream_to_df(
        spark, flagged, "append", state_partitions=PY_STATE_PARTITIONS
    )
    f = out.select("doc_id").distinct().withColumn("__f", F.lit(1))
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", "source")
        .join(f, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.coalesce("__f", F.lit(0))).cast("long").alias("n_flagged"),
        )
        .select(
            "source",
            "n_docs",
            "n_flagged",
            (F.col("n_docs") - F.col("n_flagged")).cast("long").alias("n_kept"),
            F.round(
                F.lit(1e6) * (F.col("n_docs") - F.col("n_flagged")) / F.col("n_docs"),
                0,
            )
            .cast("long")
            .alias("kept_ppm"),
        )
        .orderBy("source")
    )


def q309_incremental_neardup_merge(
    spark: SparkSession, sf_dir: str, k: int = 3
) -> DataFrame:
    """INCREMENTAL near-dup ingest — a new-crawl-shard REPLAY merged
    into the existing verified-pair table, graded against a
    from-scratch recompute (VERDICT r13 item 3: composes the round-13
    headline artifacts — the q308 in-stream banding kernel and the
    verified_pairs KeyedUpsertSink MERGE machinery — into one graded
    end-to-end path; q113's shard-vs-corpus posture, upgraded from
    exact to NEAR-dup).

    State before the shard arrives (batch 0): the corpus (doc_id % 5
    != 0) owns a banded MinHash INDEX table (operators/dedup
    ``banded_table`` — (doc_id, band, band_hash), the LSH index a crawl
    pipeline persists) and a verified within-corpus pair table, both
    committed through KeyedUpsertSink. The shard (doc_id % 5 == 0)
    then arrives as a k-batch doc_id-ordered replay; every micro-batch
    (a) bands its own docs with the SAME row-local kernel (8-hash KM
    minhash, 4x2 banding, UNCAPPED — q308's kernel: no pair cap means
    candidates(corpus ∪ shard) = candidates(corpus) ∪
    candidates(≥1 shard endpoint) EXACTLY, so incremental needs no
    retraction pass), (b) probes the index snapshot for bucket
    co-members, forming only pairs with ≥1 endpoint in the batch,
    (c) exact-Jaccard-verifies those candidates with shingles computed
    ONLY for the candidate endpoints (the delta-sized verify — a
    left-semi join scopes the documents scan to the dirty doc set,
    never the corpus), and (d) MERGEs the ≥0.8 survivors and its own
    band rows into the two sinks (idempotent across batch re-delivery
    via the _HEAD batch-id fence). The graded output is the FINAL pair
    snapshot, which must equal the from-scratch full-corpus chain in
    SQL — under any batch split (min-id pair orientation and
    last-writer-wins MERGE make the final state split-invariant; a
    pair materializes in the batch where its LATER endpoint arrives).

    Scale: per-ingest cost is O(shard band rows + candidate pairs +
    delta shingles + dirty buckets) — the corpus is touched only
    through the index probe join, never re-shingled. At 100 TB the
    index table would be bucketed on band_hash so the probe join is
    exchange-free on the corpus side; the MERGE commits O(dirty
    buckets) files per batch (streaming/upsert.py). The uncapped
    kernel's bucket mass is bounded by the 4x2 banding operating
    point, not a cap — degenerate corpora ride the capped production
    kernel (verified_pairs) whose cap-transition semantics are a
    documented difference, not a silent one."""
    import shutil as _sh

    from pandas_streaming_spark.operators.dedup import (
        banded_table,
        ngram_jaccard_pairs,
    )
    from pandas_streaming_spark.streaming.replay import (
        _fresh_dir,
        replay_docs,
        write_doc_replay_batches,
    )
    from pandas_streaming_spark.streaming.upsert import KeyedUpsertSink

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)

    def endpoints(cand: DataFrame) -> DataFrame:
        return (
            cand.select(F.col("id_a").alias("doc_id"))
            .union(cand.select(F.col("id_b").alias("doc_id")))
            .distinct()
        )

    def verify(cand: DataFrame) -> DataFrame:
        # delta-sized: shingles only for docs appearing in candidates
        sub = docs.join(endpoints(cand), "doc_id", "left_semi")
        p = ngram_jaccard_pairs(sub, k=3, threshold=0.0, candidates=cand)
        jac_e4 = F.round(
            F.lit(10000.0)
            * F.col("common")
            / (F.col("na") + F.col("nb") - F.col("common")),
            0,
        ).cast("long")
        return p.select("id_a", "id_b", jac_e4.alias("jac_e4")).filter(
            F.col("jac_e4") >= 8000
        )

    band_sink = KeyedUpsertSink(
        _fresh_dir("incbands"), ["doc_id", "band"], ["band_hash"], num_buckets=8
    )
    pair_sink = KeyedUpsertSink(
        _fresh_dir("incpairs"), ["id_a", "id_b"], ["jac_e4"], num_buckets=8
    )
    chkpt = _fresh_dir("chkpt")
    try:
        # batch 0: the pre-existing ingested state
        cbands = banded_table(corpus, n_hashes=8, bands=4, k=3)
        band_sink(cbands, batch_id=0)
        seen0 = band_sink.read(spark)
        base_cand = (
            seen0.alias("a")
            .join(seen0.alias("b"), ["band", "band_hash"])
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
            )
            .distinct()
        )
        pair_sink(verify(base_cand), batch_id=0)

        def ingest(batch_df: DataFrame, batch_id: int) -> None:
            nb = banded_table(
                batch_df, n_hashes=8, bands=4, k=3
            ).localCheckpoint(eager=True)
            seen = band_sink.read(spark)  # corpus + earlier batches
            allb = seen.unionByName(nb)
            cand = (
                nb.alias("n")
                .join(allb.alias("s"), ["band", "band_hash"])
                .filter(F.col("n.doc_id") != F.col("s.doc_id"))
                .select(
                    F.least("n.doc_id", "s.doc_id").alias("id_a"),
                    F.greatest("n.doc_id", "s.doc_id").alias("id_b"),
                )
                .distinct()
            )
            pair_sink(verify(cand), batch_id=batch_id + 1)
            band_sink(nb, batch_id=batch_id + 1)

        replay_dir = write_doc_replay_batches(
            spark, sf_dir, k, where="doc_id % 5 = 0"
        )
        stream = replay_docs(spark, sf_dir, replay_dir)
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(STATE_PARTITIONS))
        try:
            q = (
                stream.writeStream.outputMode("append")
                .foreachBatch(ingest)
                .option("checkpointLocation", chkpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        snap = (
            pair_sink.read(spark)
            .select("id_a", "id_b", "jac_e4")
            .orderBy("id_a", "id_b")
            .localCheckpoint(eager=True)
        )
    finally:
        band_sink.close()
        pair_sink.close()
        _sh.rmtree(chkpt, ignore_errors=True)
    return snap


def q312_capped_incremental_neardup(
    spark: SparkSession, sf_dir: str, k: int = 3
) -> DataFrame:
    """CAP-AWARE incremental near-dup MERGE (r15, VERDICT r14 item 1 —
    the flagship stack's last scale exposure): q309's incremental path
    required the UNCAPPED kernel, whose bucket depth grows with
    duplication density (the densified 10x probe was superlinear), so
    degenerate corpora had to ride a DIFFERENT kernel with no graded
    bridge. This entry closes the gap with the CAPPED kernel on both
    sides: per bucket only the ``cap``=2 smallest ids are CLAIMANTS and
    a pair needs its smaller endpoint claimed (q308's min-id bucket
    claim, generalized) — probe cost O(cap) per band row, pair mass
    O(cap x bucket depth), both degenerate-corpus-safe, and the kernel
    stays a pure SET function so incremental == from-scratch exactly.

    Machinery (operators/dedup.CappedLshIndex): four MERGE tables —
    full membership (insert-only, read only on claimant entry), the
    claimant sets and the per-bucket candidate pairs BOTH maintained by
    r14's MERGE WITH DELETE (a shard doc with a smaller id DETHRONES a
    stored claimant: its claim row and exactly its pairs-via-that-
    bucket are tombstoned, while the same pair stays live through other
    buckets), and a once-ever exact-Jaccard score table (delta-sized
    verify, shingles scoped to never-scored endpoints). Corpus
    (doc_id % 5 != 0) ingests as step 0; the shard (doc_id % 5 == 0)
    replays in k doc_id-ordered micro-batches through the SAME ingest.
    Graded output: the final live-pair snapshot at jac >= 0.8, which
    must equal the from-scratch capped batch chain over ALL documents
    (semilattice identity pinned in tests; split-invariant k∈{1,3,5};
    dethroning provably exercised — ~20 corpus claimants fall at
    sf0.001). Scale: every per-shard term is bounded by shard size or
    cap, never by corpus bucket depth — the capped 10x densified probe
    (scripts/probe_cap10x.py) is the measured receipt."""
    import shutil as _sh

    from pandas_streaming_spark.operators.dedup import CappedLshIndex
    from pandas_streaming_spark.streaming.replay import (
        _fresh_dir,
        replay_docs,
        write_doc_replay_batches,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    idx = CappedLshIndex(_fresh_dir("capidx"), cap=2, n_hashes=8, bands=4, k=3)
    chkpt = _fresh_dir("chkpt-cap")
    try:
        idx.ingest(corpus, step=0, docs_lookup=docs)
        replay_dir = write_doc_replay_batches(
            spark, sf_dir, k, where="doc_id % 5 = 0"
        )
        stream = replay_docs(spark, sf_dir, replay_dir)
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(STATE_PARTITIONS))
        try:
            q = (
                stream.writeStream.outputMode("append")
                .foreachBatch(
                    lambda b, bid: idx.ingest(b, step=bid + 1, docs_lookup=docs)
                )
                .option("checkpointLocation", chkpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        snap = (
            idx.pairs(spark, 8000)
            .orderBy("id_a", "id_b")
            .localCheckpoint(eager=True)
        )
    finally:
        idx.close()
        _sh.rmtree(chkpt, ignore_errors=True)
    return snap


def q313_crash_consistent_ingest(
    spark: SparkSession, sf_dir: str, k: int = 3
) -> DataFrame:
    """Crash-consistent ATOMIC multi-table ingest (r15, VERDICT r14
    item 8's "multi-statement transactional MERGE" made concrete): the
    capped incremental index maintains FOUR MERGE tables per shard —
    members, claimants, candidate pairs, scores — and until this round
    committed them sequentially, so a writer dying mid-ingest left a
    torn index (pairs without their justifying claimant; members
    missing, so a later entrant's backfill silently missed pairs).
    Every ingest now commits through streaming/txn.SinkTransactionLog:
    data staged per table, ONE conditional-put transaction record as
    the commit point, promotion into per-table manifests as an
    idempotent redo.

    The graded lifecycle injects BOTH crash windows and must still end
    byte-equal to the from-scratch capped recompute (the exact q312
    oracle): corpus (doc_id % 5 != 0) ingests as step 0; the shard
    (doc_id % 5 == 0) splits into k batches; batch 1's writer dies
    AFTER staging but BEFORE the tx record (on restart nothing is
    visible — asserted — the staged directories are reclaimed by
    vacuum_orphans, and the batch re-ingests as a full redo); batch 2's
    writer dies immediately AFTER the tx record (on restart recover()
    promotes the committed record, and the foreachBatch re-delivery of
    the same batch id is skipped by the GROUP-level fence — exactly-
    once across all four tables, not per table). Split-invariant
    k∈{1,3,5} (k=1 exercises the torn-stage window alone). At 100 TB
    the protocol is the same metadata dance: the tx record is O(tables
    × dirty buckets) JSON and maps to an object store's if-none-match
    put; data files never move on recovery."""
    from pandas_streaming_spark.operators.dedup import CappedLshIndex
    from pandas_streaming_spark.streaming.replay import _fresh_dir

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    # any split yields the same final state (semilattice identity, as
    # q312); modulo on doc_id/5 avoids a global sort
    shard = docs.filter(F.col("doc_id") % 5 == 0).withColumn(
        "__b", F.pmod((F.col("doc_id") / F.lit(5)).cast("long"), F.lit(k))
    )
    base = _fresh_dir("capidx-crash")
    idx = CappedLshIndex(base, cap=2, n_hashes=8, bands=4, k=3)
    try:
        idx.ingest(corpus, step=0, docs_lookup=docs)
        pre_pairs = idx.pairs(spark, 8000).count()
        for i in range(1, k + 1):
            batch = shard.filter(F.col("__b") == i - 1).drop("__b")
            if i == 1:
                # crash window A: dies after staging, before the record
                idx.ingest(batch, step=i, docs_lookup=docs, torn="staged")
                idx = CappedLshIndex(base, cap=2)  # ops restart
                got = idx.pairs(spark, 8000).count()
                if got != pre_pairs:
                    raise AssertionError(
                        f"torn stage leaked state: {got} != {pre_pairs}"
                    )
                if idx.log.vacuum_orphans(grace_sec=0.0) < 1:
                    raise AssertionError("no staged orphans reclaimed")
                idx.ingest(batch, step=i, docs_lookup=docs)  # full redo
            elif i == 2:
                # crash window B: dies right after the record lands
                idx.ingest(batch, step=i, docs_lookup=docs, torn="committed")
                idx = CappedLshIndex(base, cap=2)  # recover() promotes
                # foreachBatch re-delivery: group fence skips, atomically
                idx.ingest(batch, step=i, docs_lookup=docs)
            else:
                idx.ingest(batch, step=i, docs_lookup=docs)
        snap = (
            idx.pairs(spark, 8000)
            .orderBy("id_a", "id_b")
            .localCheckpoint(eager=True)
        )
    finally:
        idx.close()
    return snap


QUERIES = {
    "q313_crash_consistent_ingest": q313_crash_consistent_ingest,
    "q312_capped_incremental_neardup": q312_capped_incremental_neardup,
    "q309_incremental_neardup_merge": q309_incremental_neardup_merge,
    "q308_stream_neardup_dedup": q308_stream_neardup_dedup,
    "q303_stream_ingest_curation": q303_stream_ingest_curation,
    "q43_stream_tumbling": q43_stream_tumbling,
    "q44_stream_sliding": q44_stream_sliding,
    "q45_stream_session": q45_stream_session,
    "q46_stream_dedup": q46_stream_dedup,
    "q47_stream_static_join": q47_stream_static_join,
    "q48_stateful_accumulate": q48_stateful_accumulate,
    "q60_stream_stream_join": q60_stream_stream_join,
    "q71_stream_outer_join": q71_stream_outer_join,
    "q72_stream_ewm": q72_stream_ewm,
    "q98_stream_funnel": q98_stream_funnel,
    "q229_stream_cusum": q229_stream_cusum,
    "q101_stream_trending": q101_stream_trending,
    "q111_stateful_tws": q111_stateful_tws,
    "q117_stream_rolling": q117_stream_rolling,
    "q119_dedup_within_watermark": q119_dedup_within_watermark,
    "q121_tws_session_timers": q121_tws_session_timers,
    "q142_stream_full_outer": q142_stream_full_outer,
    "q155_stream_hll": q155_stream_hll,
    "q158_stream_cms": q158_stream_cms,
}

ORACLES = {
    # from-scratch CAPPED recompute: pair (a, b) is a candidate iff some
    # bucket holds both AND a is among that bucket's 2 smallest ids
    # (rk <= 2 claimants); then the exact 3-shingle Jaccard >= 0.8 —
    # the incremental MERGE's final live-pair snapshot must equal this
    # under any shard split
    "q312_capped_incremental_neardup": """
WITH toks AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
),
sh AS (
  SELECT doc_id,
         UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, GREATEST(LEN(t) - 2, 0)),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
  FROM toks
),
sig AS (
  SELECT doc_id, s,
         MIN(CAST(CONCAT('0x', SUBSTR(MD5(sh), 1, 7)) AS BIGINT)
             + s * CAST(CONCAT('0x', SUBSTR(MD5(sh), 8, 7)) AS BIGINT)) AS mh
  FROM sh CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 7)) AS s)
  GROUP BY doc_id, s
),
bands AS (
  SELECT doc_id, s // 2 AS band, MD5(STRING_AGG(mh, '|' ORDER BY s)) AS bh
  FROM sig GROUP BY doc_id, s // 2
),
cl AS (
  SELECT doc_id, band, bh,
         ROW_NUMBER() OVER (PARTITION BY band, bh ORDER BY doc_id) AS rk
  FROM bands
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM cl a
  JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
  WHERE a.rk <= 2
),
shd AS MATERIALIZED (SELECT DISTINCT doc_id, sh FROM sh),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM shd GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS c
  FROM cand c
  JOIN shd a ON a.doc_id = c.id_a
  JOIN shd b ON b.doc_id = c.id_b AND b.sh = a.sh
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       CAST(ROUND(10000.0 * c / (na.n + nb.n - c), 0) AS BIGINT) AS jac_e4
FROM common
JOIN sizes na ON na.doc_id = id_a
JOIN sizes nb ON nb.doc_id = id_b
WHERE ROUND(10000.0 * c / (na.n + nb.n - c), 0) >= 8000
ORDER BY id_a, id_b
""",
    # finite replay => streaming bucket-claim final state must equal the
    # batch answer: 3-shingles -> KM minhash (h1 + s*h2 over two 28-bit
    # md5 halves, the llm.py _MINHASH_SIG chain) -> 4x2 banding ->
    # flagged = doc_id > bucket min, distinct per doc
    # from-scratch full-corpus recompute: the incremental MERGE's final
    # pair snapshot must equal the whole chain run over ALL documents —
    # uncapped 4x2 banding candidates, exact 3-shingle Jaccard >= 0.8
    "q309_incremental_neardup_merge": """
WITH toks AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
),
sh AS (
  SELECT doc_id,
         UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, GREATEST(LEN(t) - 2, 0)),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
  FROM toks
),
sig AS (
  SELECT doc_id, s,
         MIN(CAST(CONCAT('0x', SUBSTR(MD5(sh), 1, 7)) AS BIGINT)
             + s * CAST(CONCAT('0x', SUBSTR(MD5(sh), 8, 7)) AS BIGINT)) AS mh
  FROM sh CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 7)) AS s)
  GROUP BY doc_id, s
),
bands AS (
  SELECT doc_id, s // 2 AS band, MD5(STRING_AGG(mh, '|' ORDER BY s)) AS bh
  FROM sig GROUP BY doc_id, s // 2
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
shd AS MATERIALIZED (SELECT DISTINCT doc_id, sh FROM sh),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM shd GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS c
  FROM cand c
  JOIN shd a ON a.doc_id = c.id_a
  JOIN shd b ON b.doc_id = c.id_b AND b.sh = a.sh
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       CAST(ROUND(10000.0 * c / (na.n + nb.n - c), 0) AS BIGINT) AS jac_e4
FROM common
JOIN sizes na ON na.doc_id = id_a
JOIN sizes nb ON nb.doc_id = id_b
WHERE ROUND(10000.0 * c / (na.n + nb.n - c), 0) >= 8000
ORDER BY id_a, id_b
""",
    "q308_stream_neardup_dedup": """
WITH toks AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
),
sh AS (
  SELECT doc_id,
         UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, GREATEST(LEN(t) - 2, 0)),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
  FROM toks
),
sig AS (
  SELECT doc_id, s,
         MIN(CAST(CONCAT('0x', SUBSTR(MD5(sh), 1, 7)) AS BIGINT)
             + s * CAST(CONCAT('0x', SUBSTR(MD5(sh), 8, 7)) AS BIGINT)) AS mh
  FROM sh CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 7)) AS s)
  GROUP BY doc_id, s
),
bands AS (
  SELECT doc_id, s // 2 AS band, MD5(STRING_AGG(mh, '|' ORDER BY s)) AS bh
  FROM sig GROUP BY doc_id, s // 2
),
flagged AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, MIN(doc_id) OVER (PARTITION BY band, bh) AS w FROM bands
  ) WHERE doc_id > w
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_flagged,
       CAST(SUM(CASE WHEN f.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(ROUND(1e6 * SUM(CASE WHEN f.doc_id IS NULL THEN 1 ELSE 0 END)
                  / COUNT(*), 0) AS BIGINT) AS kept_ppm
FROM documents d LEFT JOIN flagged f ON f.doc_id = d.doc_id
GROUP BY d.source
ORDER BY d.source
""",
    # finite replay => streaming final state must equal the batch
    # answer: gates + per-source distinct-md5 dedup + token sums
    "q303_stream_ingest_curation": """
WITH per AS (
  SELECT source, text,
         CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n,
         LEN(REPLACE(text, ' ', '')) AS sl,
         LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS nd,
         LEN(LIST_INTERSECT(LIST_DISTINCT(STRING_SPLIT(text, ' ')),
                            ['the','a','of','to','and'])) AS ns,
         LIST_MAX(LIST_TRANSFORM(LIST_DISTINCT(STRING_SPLIT(text, ' ')),
                  x -> LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                       y -> y = x)))) AS mx
  FROM documents
),
ded AS (
  SELECT source, MD5(text) AS h, ANY_VALUE(n) AS n
  FROM per
  WHERE n >= 30 AND n <= 10000 AND sl >= 3 * n AND sl <= 10 * n
    AND nd * 10 >= 3 * n AND ns >= 2 AND mx * 5 <= n
  GROUP BY source, MD5(text)
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_unique_pass,
       CAST(SUM(n) AS BIGINT) AS n_tokens
FROM ded GROUP BY source ORDER BY source
""",
    "q43_stream_tumbling": """
SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M') AS w_start,
       event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY w_start, event_type
""",
    "q44_stream_sliding": """
SELECT STRFTIME(DATE_TRUNC('hour', ts) - TO_HOURS(k), '%Y-%m-%d %H:%M') AS w_start,
       COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS k)
GROUP BY 1
ORDER BY w_start
""",
    "q45_stream_session": """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         -- strictly greater: Spark's session_window treats an event at
         -- exactly last_ts + gap as touching, and touching windows merge
         -- (pinned by tests/test_session_property.py)
         CASE WHEN LAG(ts) OVER w IS NULL
              OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
),
per_session AS (
  SELECT user_id, session_id, COUNT(*) AS n_events
  FROM sessions GROUP BY user_id, session_id
)
SELECT user_id, COUNT(*) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       MAX(n_events) AS max_session_events
FROM per_session
GROUP BY user_id
ORDER BY user_id
""",
    "q46_stream_dedup": """
SELECT COUNT(*) AS n_events, COUNT(DISTINCT event_id) AS n_unique FROM events
""",
    "q47_stream_static_join": """
WITH dim AS (
  SELECT c_custkey % 20 AS user_id, COUNT(*) AS n_cust
  FROM customer GROUP BY c_custkey % 20
)
SELECT e.user_id, COUNT(*) AS n_events, MAX(d.n_cust) AS n_cust,
       ROUND(SUM(e.value), 2) AS sum_value
FROM events e JOIN dim d ON e.user_id = d.user_id
GROUP BY e.user_id
ORDER BY e.user_id
""",
    "q48_stateful_accumulate": """
SELECT user_id, COUNT(*) AS n_events, MAX(value) AS max_value
FROM events
GROUP BY user_id
ORDER BY user_id
""",
    "q60_stream_stream_join": """
SELECT p.user_id, COUNT(*) AS n_pairs,
       COUNT(DISTINCT p.event_id) AS n_purchases_with_click
FROM events p
JOIN events c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 1 HOUR
 AND c.ts <= p.ts
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
GROUP BY p.user_id
ORDER BY p.user_id
""",
    "q71_stream_outer_join": """
SELECT p.user_id, COUNT(*) AS n_rows,
       COUNT(c.event_id) AS n_matched,
       CAST(SUM(CASE WHEN c.event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched
FROM events p
LEFT JOIN events c
  ON p.user_id = c.user_id
 AND c.event_type = 'click'
 AND c.ts >= p.ts - INTERVAL 1 HOUR
 AND c.ts <= p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.user_id
ORDER BY p.user_id
""",
    # Runs the exact (num*0.5 + v) fold the streaming operator runs, so
    # the division num/den is performed on bit-identical operands.
    "q72_stream_ewm": """
WITH RECURSIVE ordered AS (
  -- fold order is event time, matching the replay's time-contiguous
  -- batches (r7); event_id alone stops being time-monotone at 10x
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
rec AS (
  SELECT user_id, event_id, rn,
         value AS num, CAST(1.0 AS DOUBLE) AS den
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.user_id, o.event_id, o.rn,
         r.num * 0.5 + o.value, r.den * 0.5 + 1.0
  FROM ordered o JOIN rec r ON o.user_id = r.user_id AND o.rn = r.rn + 1
)
SELECT user_id, event_id,
       CAST(FLOOR(num / den * 1e6 + 0.5) AS BIGINT) AS ewm_e6
FROM rec
ORDER BY user_id, event_id
""",
}

# streaming-vs-batch equivalence pinned by construction: the streaming
# funnel grades against the batch q94 oracle verbatim
from pandas_streaming_spark.queries import analytic as _analytic  # noqa: E402

ORACLES["q98_stream_funnel"] = _analytic.ORACLES["q94_funnel"]

# streaming CUSUM grades against the batch q219 recursive-CTE oracle
# verbatim — the same pairing contract
from pandas_streaming_spark.queries import timeseries as _timeseries  # noqa: E402

ORACLES["q229_stream_cusum"] = _timeseries.ORACLES["q219_cusum_drift"]

# transformWithStateInPandas grades against the SAME batch oracle as the
# applyInPandasWithState form — API successor, identical contract
ORACLES["q111_stateful_tws"] = ORACLES["q48_stateful_accumulate"]
# q313 ends in the SAME final state as q312 (crash injection + recovery
# must be invisible in the result) — the from-scratch capped recompute
# IS its oracle
ORACLES["q313_crash_consistent_ingest"] = ORACLES[
    "q312_capped_incremental_neardup"
]

# dropDuplicatesWithinWatermark must converge to the same batch-distinct
# counts as plain dropDuplicates when dups arrive inside the watermark
ORACLES["q119_dedup_within_watermark"] = ORACLES["q46_stream_dedup"]


# timer-finalized sessionization must produce the same per-user session
# table as session_window — the q45 oracle verbatim
ORACLES["q121_tws_session_timers"] = ORACLES["q45_stream_session"]

ORACLES["q117_stream_rolling"] = """
SELECT user_id, event_id,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS win_sum_cents,
       CAST(LEAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id),
                  5) AS BIGINT) AS win_count
FROM events
ORDER BY user_id, event_id
"""

ORACLES["q101_stream_trending"] = """
WITH c AS (
  SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M') AS w_start,
         event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT w_start, event_type, n,
         ROW_NUMBER() OVER (PARTITION BY w_start
                            ORDER BY n DESC, event_type) AS rnk
  FROM c
)
SELECT w_start, event_type, n, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 2
ORDER BY w_start, rnk
"""


ORACLES["q142_stream_full_outer"] = """
WITH p AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
),
j AS (
  SELECT COALESCE(p.user_id, c.user_id) AS user_id,
         p.event_id AS purchase_id, c.event_id AS click_id
  FROM p FULL OUTER JOIN c
    ON p.user_id = c.user_id
   AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
)
SELECT user_id, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN purchase_id IS NOT NULL AND click_id IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
       CAST(SUM(CASE WHEN click_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_purchase_only,
       CAST(SUM(CASE WHEN purchase_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_click_only
FROM j GROUP BY user_id ORDER BY user_id
"""



def _hll_stream_oracle() -> str:
    from pandas_streaming_spark.operators.sketches import hll_sql

    inner = hll_sql("user_id", "event_type").replace("__HLL_SRC__", "events")
    return f"""
SELECT g AS event_type, ROUND(hll_est, 2) AS hll_est
FROM ({inner}) hll
ORDER BY event_type
"""


ORACLES["q155_stream_hll"] = _hll_stream_oracle()


def _cms_stream_oracle() -> str:
    from pandas_streaming_spark.operators.sketches import cms_bucket_sql

    cells = "\n  UNION ALL ".join(
        f"SELECT {r} AS cms_row, {cms_bucket_sql('user_id', r, 128)} AS cms_col,"
        f" COUNT(*) AS cms_cnt FROM events GROUP BY 2"
        for r in range(4)
    )
    probes = "\n  UNION ALL ".join(
        f"SELECT user_id, true_cnt, {r} AS r,"
        f" {cms_bucket_sql('user_id', r, 128)} AS c FROM top"
        for r in range(4)
    )
    return f"""
WITH truec AS (
  SELECT user_id, COUNT(*) AS true_cnt FROM events GROUP BY user_id
),
top AS (
  SELECT user_id, true_cnt FROM truec ORDER BY true_cnt DESC, user_id LIMIT 10
),
cells AS (
  {cells}
),
probes AS (
  {probes}
)
SELECT p.user_id, p.true_cnt, MIN(cells.cms_cnt) AS cms_est,
       MIN(cells.cms_cnt) - p.true_cnt AS overestimate
FROM probes p JOIN cells ON cells.cms_row = p.r AND cells.cms_col = p.c
GROUP BY p.user_id, p.true_cnt
ORDER BY p.true_cnt DESC, p.user_id
"""


ORACLES["q158_stream_cms"] = _cms_stream_oracle()
