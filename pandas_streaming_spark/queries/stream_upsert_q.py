"""Streaming MERGE-sink queries split out of `streaming_q` (round 6,
VERDICT r5 item 8): the events replay driving the KeyedUpsertSink —
idempotent per-key upserts graded against the batch latest-row
oracle, and the continuously-maintained rollup view.

Same house rules and oracle discipline as the parent module.
"""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pandas_streaming_spark.streaming.replay import replay_events, write_replay_batches

# module reference, not a value import: tests monkeypatch
# streaming_q.K_BATCHES to drive split-invariance checks
from pandas_streaming_spark.queries import streaming_q as _sq


def q140_upsert_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch keyed MERGE sink (streaming/upsert.KeyedUpsertSink):
    the events replay upserts each user's latest row into a bucketed
    manifest-committed parquet table — the Delta/Iceberg MERGE shape
    with per-batch cost O(batch + dirty buckets), idempotent across
    batch re-delivery via the _HEAD batch-id fence. The oracle is the
    batch "latest row per key" query: final table ≡ last-writer-wins
    over the whole stream, regardless of the batch split (split
    invariance pinned in tests at k∈{1,5,20})."""
    import shutil as _sh

    from pandas_streaming_spark.streaming.replay import _fresh_dir
    from pandas_streaming_spark.streaming.upsert import KeyedUpsertSink

    replay_dir = write_replay_batches(spark, sf_dir, _sq.K_BATCHES)
    stream = replay_events(spark, sf_dir, replay_dir)
    sink = KeyedUpsertSink(
        _fresh_dir("upsert"), ["user_id"], ["ts", "event_id"], num_buckets=8
    )
    chkpt = _fresh_dir("chkpt")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(_sq.STATE_PARTITIONS))
    try:
        q = (
            stream.writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", chkpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    snap = sink.read(spark).localCheckpoint(eager=True)
    sink.close()
    _sh.rmtree(chkpt, ignore_errors=True)
    return snap.select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.round("value", 2).alias("last_value"),
    ).orderBy("user_id")


def q151_streaming_rollup_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MATERIALIZED VIEW maintenance — the q143 continuous
    aggregate kept fresh by the stream: update-mode hourly partials
    (count + integer-cent sum per event type) flow through the
    KeyedUpsertSink, whose last-writer-wins MERGE keyed on the group
    retains each group's newest partial. The batch id is the sequence
    (monotone per re-emitted group), so re-deliveries and late updates
    resolve exactly like any warehouse MV refresh. Final table ==
    one-shot batch rollup, graded against the raw-events oracle."""
    import shutil as _sh

    from pandas_streaming_spark.streaming.replay import _fresh_dir
    from pandas_streaming_spark.streaming.upsert import KeyedUpsertSink

    replay_dir = write_replay_batches(spark, sf_dir, _sq.K_BATCHES)
    stream = replay_events(spark, sf_dir, replay_dir)
    partials = (
        stream.withColumn("cents", F.round(F.col("value") * 100, 0).cast("long"))
        .groupBy(F.date_trunc("hour", "ts").alias("bucket_ts"), "event_type")
        .agg(F.count("*").alias("cnt"), F.sum("cents").alias("sum_cents"))
    )
    sink = KeyedUpsertSink(
        _fresh_dir("mv"), ["bucket_ts", "event_type"], ["__seq"], num_buckets=8
    )
    chkpt = _fresh_dir("chkpt-mv")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(_sq.STATE_PARTITIONS))
    try:
        q = (
            partials.writeStream.outputMode("update")
            .foreachBatch(
                lambda df, bid: sink(df.withColumn("__seq", F.lit(bid)), bid)
            )
            .option("checkpointLocation", chkpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    view = sink.read(spark).localCheckpoint(eager=True)
    sink.close()
    _sh.rmtree(chkpt, ignore_errors=True)
    return view.select(
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm").alias("hour"),
        "event_type",
        F.col("cnt").alias("n"),
        (F.col("sum_cents") / 100.0).alias("sum_value"),
    ).orderBy("hour", "event_type")


QUERIES = {
    "q140_upsert_sink": q140_upsert_sink,
    "q151_streaming_rollup_view": q151_streaming_rollup_view,
}

ORACLES = {
}

ORACLES["q140_upsert_sink"] = """
SELECT user_id, event_type AS last_event_type, ROUND(value, 2) AS last_value
FROM (
  SELECT user_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
ORDER BY user_id
"""

ORACLES["q151_streaming_rollup_view"] = """
WITH c AS (
  SELECT ts, event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M') AS hour, event_type,
       COUNT(*) AS n,
       CAST(SUM(cents) AS DOUBLE) / 100.0 AS sum_value
FROM c GROUP BY 1, 2 ORDER BY hour, event_type
"""
