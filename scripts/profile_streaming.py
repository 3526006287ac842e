#!/usr/bin/env python
"""Decompose the streaming replay's wall time (VERDICT r4 item 5).

The bench's ~20k events/s replay rate is suspected to be harness-bound
(micro-batch scheduling + sink), not engine-bound. This script measures,
at $SPARK_GRAFT_SF_DIR (default sf0.1):

  a. protocol     - q43 tumbling agg, k=5 file batches, parquet spill sink
                    (exactly what bench.py times)
  b. k1           - same query, k=1 (isolates per-trigger overhead:
                    a - b ~= 4 extra triggers)
  c. noop_sink    - k=5 with a no-op foreachBatch (isolates the parquet
                    spill + final-read cost)
  d. passthrough  - k=5, no aggregation, count-only sink (isolates the
                    source read + scheduling floor below any query work)
  e. batch        - the equivalent one-shot batch aggregation (the
                    streaming-overhead-free lower bound)

Each variant runs twice (first warms split caches/JIT) and reports the
second. Prints one JSON line; paste the numbers into
plans/scale_notes.md's streaming stanza.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import functions as F

    from pandas_streaming_spark.session import get_spark
    from pandas_streaming_spark.streaming.replay import (
        replay_events,
        run_stream_to_df,
        write_replay_batches,
        _fresh_dir,
    )

    spark = get_spark("stream-profile")
    spark.sparkContext.setLogLevel("ERROR")

    import pyarrow.parquet as pq

    n_events = pq.read_metadata(os.path.join(sf_dir, "events.parquet")).num_rows

    def tumbling(stream):
        return (
            stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
        )

    def timed(fn):
        fn()  # warm
        t0 = time.perf_counter()
        fn()
        return round(time.perf_counter() - t0, 4)

    out: dict[str, object] = {"sf_dir": sf_dir, "n_events": n_events}

    # a. the bench protocol (state_partitions=1, the streaming_q shape —
    # omitting it measures 32 near-empty store commits per trigger
    # instead of the protocol actually benched)
    d5 = write_replay_batches(spark, sf_dir, 5)
    out["protocol_k5_sec"] = timed(
        lambda: run_stream_to_df(
            spark, tumbling(replay_events(spark, sf_dir, d5)), "complete",
            state_partitions=1,
        ).collect()
    )

    # a2. catch-up: same 5-file split, availableNow batches the backlog
    # into one trigger (bench's events_per_sec_catchup shape; catch-up
    # state partitions per streaming_q.CATCHUP_STATE_PARTITIONS)
    out["catchup_sec"] = timed(
        lambda: run_stream_to_df(
            spark,
            tumbling(
                replay_events(spark, sf_dir, d5, max_files_per_trigger=None)
            ),
            "complete",
            state_partitions=4,
        ).collect()
    )

    # b. one trigger
    d1 = write_replay_batches(spark, sf_dir, 1)
    out["k1_sec"] = timed(
        lambda: run_stream_to_df(
            spark, tumbling(replay_events(spark, sf_dir, d1)), "complete",
            state_partitions=1,
        ).collect()
    )

    # c. k=5 with a no-op sink (no parquet spill, no final read)
    def noop_sink():
        chkpt = _fresh_dir("chkpt-prof")
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        q = (
            tumbling(replay_events(spark, sf_dir, d5))
            .writeStream.outputMode("complete")
            # noop format consumes every partition (required by Spark 4's
            # state-store commit validation) without touching disk
            .foreachBatch(
                lambda b, i: b.write.format("noop").mode("overwrite").save()
            )
            .option("checkpointLocation", chkpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        import shutil

        shutil.rmtree(chkpt, ignore_errors=True)

    out["noop_sink_k5_sec"] = timed(noop_sink)

    # d. passthrough (no agg, count-only sink): source + scheduling floor
    def passthrough():
        chkpt = _fresh_dir("chkpt-prof")
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        q = (
            replay_events(spark, sf_dir, d5)
            .writeStream.outputMode("append")
            .foreachBatch(
                lambda b, i: b.write.format("noop").mode("overwrite").save()
            )
            .option("checkpointLocation", chkpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        import shutil

        shutil.rmtree(chkpt, ignore_errors=True)

    out["passthrough_k5_sec"] = timed(passthrough)

    # e. batch lower bound
    from pandas_streaming_spark.catalog import load_table

    out["batch_sec"] = timed(
        lambda: tumbling(load_table(spark, sf_dir, "events")).collect()
    )

    p = out["protocol_k5_sec"]
    out["events_per_sec"] = {
        "protocol_k5": round(n_events / p),
        "catchup": round(n_events / out["catchup_sec"]),
        "k1": round(n_events / out["k1_sec"]),
        "noop_sink_k5": round(n_events / out["noop_sink_k5_sec"]),
    }
    out["decomposition"] = {
        "per_extra_trigger_sec": round((p - out["k1_sec"]) / 4, 4),
        "sink_spill_sec": round(p - out["noop_sink_k5_sec"], 4),
        "query_work_over_passthrough_sec": round(
            out["noop_sink_k5_sec"] - out["passthrough_k5_sec"], 4
        ),
        "streaming_overhead_vs_batch": round(p / out["batch_sec"], 1)
        if out["batch_sec"]
        else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
