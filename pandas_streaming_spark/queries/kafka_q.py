"""Kafka-contract queries split out of `streaming_q` (round 6,
VERDICT r5 item 8): the broker-less spool roundtrips exercising the
connector option surface — partitioned source replay, JSON ingestion
pipeline, and the batch DataSourceWriter sink roundtrip. A real
``format('kafka')`` broker remains env-blocked (no broker/jar in the
sandbox); the spool twin keeps the contract tested.

Same house rules and oracle discipline as the parent module.
"""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pandas_streaming_spark.catalog import load_table
from pandas_streaming_spark.streaming.replay import run_stream_to_df
from pandas_streaming_spark.queries.streaming_q import (
    K_BATCHES,
    jvm_state_partitions,
    ORACLES as _stream_oracles,
)


def q107_kafka_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka contract end-to-end without a broker: the events table is
    produced into a 4-partition spool topic (key=user_id, value=
    event_type, partition=user_id%4, event-id order within a partition),
    streamed back through the kafka_spool partitioned DataSource (the
    connector's 7-column schema, executor-side record decode), and
    graded on per-partition counts, offset ranges, value bytes and
    distinct keys. min_off=0 / max_off=n-1 proves offsets are contiguous
    — the spool replay is exactly-once, no drops and no duplicates. The
    oracle recomputes the same facts from the table, so a routing,
    framing, or offset bug cannot grade green."""
    import hashlib
    import os

    from pandas_streaming_spark.sources import kafka
    from pandas_streaming_spark.sources.kafka_spool import produce_distributed
    from pandas_streaming_spark.streaming.replay import SCRATCH

    ev = load_table(spark, sf_dir, "events")
    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    key = hashlib.md5(f"{sf_dir}|{st.st_size}|{st.st_mtime_ns}|k4".encode()).hexdigest()[:12]
    spool = os.path.join(SCRATCH, f"kspool-{key}")
    marker = os.path.join(spool, "_OK")
    if not os.path.exists(marker):
        # task-side fixture producer: explicit partition routing
        # (user_id % 4), event-id order within each partition ->
        # deterministic offsets; nothing but the 4-row write summary
        # ever reaches the driver
        produce_distributed(
            ev.select(
                F.col("user_id").cast("string").alias("key"),
                F.col("event_type").alias("value"),
                F.unix_millis("ts").alias("ts_ms"),
                (F.col("user_id") % 4).cast("int").alias("partition"),
                F.col("event_id").alias("__ord"),
            ),
            spool,
            "events",
            order_col="__ord",
        )
        with open(marker, "w") as f:
            f.write("ok")
    stream = kafka(spark, "events", "spool://" + spool)
    out = run_stream_to_df(
        spark, stream, "append", state_partitions=jvm_state_partitions(sf_dir)
    )
    return (
        out.groupBy("topic", "partition")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("offset").cast("long").alias("min_off"),
            F.max("offset").cast("long").alias("max_off"),
            F.sum(F.octet_length("value")).cast("long").alias("value_bytes"),
            F.countDistinct("key").cast("long").alias("n_keys"),
        )
        .orderBy("partition")
    )


def q115_kafka_json_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end kafka-shaped ingestion pipeline (§2.1 × §2.5
    composition): events are produced into a 4-partition spool topic
    with JSON payloads (task-side producer), streamed back through the
    partitioned kafka source, JSON-decoded (``from_json`` — JVM-side,
    no Python boundary), and aggregated into event-time tumbling
    windows keyed on the KAFKA record timestamp. Grades against the
    same batch oracle as q43, pinning that a value's trip through
    producer framing → partition logs → connector schema → JSON decode
    → ms-precision timestamps is lossless.

    maxOffsetsPerTrigger splits the replay into real micro-batches so
    the window state is built incrementally, not in one gulp."""
    import hashlib
    import os

    from pandas_streaming_spark.sources import kafka
    from pandas_streaming_spark.sources.kafka_spool import produce_distributed
    from pandas_streaming_spark.streaming.replay import SCRATCH

    ev = load_table(spark, sf_dir, "events")
    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    key = hashlib.md5(
        f"{sf_dir}|{st.st_size}|{st.st_mtime_ns}|json4".encode()
    ).hexdigest()[:12]
    spool = os.path.join(SCRATCH, f"kspool-{key}")
    marker = os.path.join(spool, "_OK")
    if not os.path.exists(marker):
        produce_distributed(
            ev.select(
                F.col("user_id").cast("string").alias("key"),
                F.to_json(F.struct("event_type", "value")).alias("value"),
                F.unix_millis("ts").alias("ts_ms"),
                (F.col("user_id") % 4).cast("int").alias("partition"),
                F.col("event_id").alias("__ord"),
            ),
            spool,
            "events_json",
            order_col="__ord",
        )
        with open(marker, "w") as f:
            f.write("ok")

    import glob as _glob

    import pyarrow.parquet as pq

    # scaled replicas are Spark-written DIRECTORIES of part files
    n = (
        sum(
            pq.read_metadata(f).num_rows
            for f in _glob.glob(os.path.join(src, "*.parquet"))
        )
        if os.path.isdir(src)
        else pq.read_metadata(src).num_rows
    )
    stream = kafka(
        spark,
        "events_json",
        "spool://" + spool,
        maxOffsetsPerTrigger=str(max(n // K_BATCHES, 1)),
    )
    parsed = stream.select(
        F.col("timestamp").alias("ts"),
        F.from_json(
            F.col("value").cast("string"), "event_type string, value double"
        ).alias("j"),
    ).select("ts", "j.event_type", "j.value")
    agg = (
        parsed.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("w_start"),
            "event_type",
            "n",
            "sv",
        )
    )
    # drain trigger: with maxOffsetsPerTrigger the availableNow snapshot
    # would stop at the first capped slice; drain keeps triggering until
    # the spool reports no new offsets (real micro-batches, full replay)
    out = run_stream_to_df(
        spark, agg, "complete", state_partitions=jvm_state_partitions(sf_dir),
        trigger="drain",
    )
    return (
        out.select(
            "w_start", "event_type", "n", F.round("sv", 2).alias("sum_value")
        )
        .orderBy("w_start", "event_type")
    )


def q128_kafka_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BATCH kafka sink under the gate (§2.1 ``to_kafka``): events
    are produced through the ``to_kafka_spool`` DataSourceWriter — every
    Spark partition's task writes its own log, published only by the
    driver's atomic commit rename — then streamed back through the
    partitioned source and graded on TOTALS (record count, payload
    bytes, distinct keys, ts range). Totals are partition-layout
    independent, which is exactly what the sink guarantees: the log↔
    partition assignment is an implementation detail, the committed
    record SET is not. A torn write, lost partition, or double-commit
    moves the totals."""
    import hashlib
    import os

    from pandas_streaming_spark.sources import kafka
    from pandas_streaming_spark.sources.kafka_spool import to_kafka_spool
    from pandas_streaming_spark.streaming.replay import SCRATCH

    ev = load_table(spark, sf_dir, "events")
    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    key = hashlib.md5(
        f"{sf_dir}|{st.st_size}|{st.st_mtime_ns}|sink".encode()
    ).hexdigest()[:12]
    spool = os.path.join(SCRATCH, f"kspool-{key}")
    marker = os.path.join(spool, "_OK")
    if not os.path.exists(marker):
        to_kafka_spool(
            ev.select(
                F.col("user_id").cast("string").alias("key"),
                F.col("event_type").alias("value"),
                F.unix_millis("ts").alias("ts_ms"),
            ).repartition(4),
            "events_sink",
            spool,
        )
        with open(marker, "w") as f:
            f.write("ok")
    stream = kafka(spark, "events_sink", "spool://" + spool)
    out = run_stream_to_df(
        spark, stream, "append", state_partitions=jvm_state_partitions(sf_dir)
    )
    return out.agg(
        F.count("*").cast("long").alias("n_records"),
        F.sum(F.octet_length("value")).cast("long").alias("value_bytes"),
        F.countDistinct("key").cast("long").alias("n_keys"),
        F.min(F.unix_millis("timestamp")).cast("long").alias("min_ts_ms"),
        F.max(F.unix_millis("timestamp")).cast("long").alias("max_ts_ms"),
    )


QUERIES = {
    "q107_kafka_roundtrip": q107_kafka_roundtrip,
    "q115_kafka_json_pipeline": q115_kafka_json_pipeline,
    "q128_kafka_sink_roundtrip": q128_kafka_sink_roundtrip,
}

ORACLES = {
    "q107_kafka_roundtrip": """
SELECT 'events' AS topic,
       CAST(user_id % 4 AS INT) AS partition,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(0 AS BIGINT) AS min_off,
       CAST(COUNT(*) - 1 AS BIGINT) AS max_off,
       -- STRLEN is bytes in duckdb; event types are ASCII so it equals
       -- the utf-8 payload size the producer framed
       CAST(SUM(STRLEN(event_type)) AS BIGINT) AS value_bytes,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_keys
FROM events
GROUP BY 2
ORDER BY partition
""",
}

ORACLES["q128_kafka_sink_roundtrip"] = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_records,
       CAST(SUM(STRLEN(event_type)) AS BIGINT) AS value_bytes,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_keys,
       CAST(FLOOR(EPOCH_US(MIN(ts)) / 1000) AS BIGINT) AS min_ts_ms,
       CAST(FLOOR(EPOCH_US(MAX(ts)) / 1000) AS BIGINT) AS max_ts_ms
FROM events
"""

# the kafka JSON pipeline must converge to the same batch tumbling-window
# table as the file replay — lossless transport, shared oracle
ORACLES["q115_kafka_json_pipeline"] = _stream_oracles["q43_stream_tumbling"]
