"""Deterministic streaming replay harness (FIXTURES.md protocol).

Replays the ``events`` table as k micro-batches through Structured
Streaming and reads back the **final state** — the graded form of the
streaming queries (Q43–Q48) and the reference's own batch-split-invariance
test (SURVEY.md §5.1): the final state must be identical for any k and
equal to the one-shot batch computation.

Split rule: batch i of k = rows with floor(event_id * k / n) == i.
Contiguous event_id ranges preserve event-time order (ts is monotone in
event_id — verified in FIXTURES.md), so each parquet file is one in-order
micro-batch via ``maxFilesPerTrigger=1``.
"""

from __future__ import annotations

import os
import shutil
import uuid

import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".scratch")


def _fresh_dir(tag: str) -> str:
    d = os.path.join(SCRATCH, f"{tag}-{uuid.uuid4().hex[:8]}")
    os.makedirs(d, exist_ok=True)
    return d


def write_replay_batches(
    sf_dir: str,
    k: int,
    out_dir: str | None = None,
    dup_every: int | None = None,
) -> str:
    """Split ``{sf_dir}/events.parquet`` into k parquet files (driver-side
    pyarrow slice — fixture prep, not a data-path operation).

    ``dup_every``: additionally append every dup_every-th row of batch i
    into batch i+1 (late duplicate injection for the dedup query Q46).
    """
    out_dir = out_dir or _fresh_dir("replay")
    table = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    # source carries TIMESTAMP(NANOS); cast to µs so the streaming reader
    # sees plain TimestampType (same truncation the batch path applies)
    import pyarrow as pa

    schema = pa.schema(
        [
            f.with_type(pa.timestamp("us")) if pa.types.is_timestamp(f.type) else f
            for f in table.schema
        ]
    )
    table = table.cast(schema, safe=False)  # ns -> µs truncation is the point
    df = table.to_pandas().sort_values("event_id").reset_index(drop=True)
    n = len(df)
    batches = [df[(df.event_id * k // n) == i] for i in range(k)]
    if dup_every:
        carried = [b.iloc[:: dup_every] for b in batches[:-1]]
        import pandas as pd

        batches = [
            b if i == 0 else pd.concat([carried[i - 1], b], ignore_index=True)
            for i, b in enumerate(batches)
        ]
    for i, b in enumerate(batches):
        pq.write_table(
            pa.Table.from_pandas(b, schema=schema, preserve_index=False),
            os.path.join(out_dir, f"batch_{i:04d}.parquet"),
        )
    return out_dir


def replay_events(spark: SparkSession, sf_dir: str, replay_dir: str) -> DataFrame:
    """Streaming DataFrame over the replay dir, one file per micro-batch.

    The replay files carry µs timestamps (write_replay_batches casts), so
    the schema is the catalog-normalized events schema."""
    from pandas_streaming_spark.catalog import load_table

    schema = load_table(spark, sf_dir, "events").schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay_dir)
    )


def run_stream_to_final(
    stream_df: DataFrame,
    output_mode: str = "complete",
    key_cols: list[str] | None = None,
):
    """Run a streaming DataFrame to completion (availableNow) and return
    the final state as a pandas DataFrame.

    - ``complete``: final state = the last full result the sink saw.
    - ``append``: final state = every appended row (e.g. streaming dedup).
    - ``update``: requires ``key_cols``; final state = last update per key
      (driver-side upsert in foreachBatch, mirroring an idempotent keyed
      sink — exactly how an external KV/Delta sink would consume it).
    """
    import pandas as pd

    chkpt = _fresh_dir("chkpt")
    state: dict = {"frames": [], "upsert": {}}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        pdf = batch_df.toPandas()
        if output_mode == "complete":
            state["frames"] = [pdf]
        elif output_mode == "append":
            state["frames"].append(pdf)
        else:  # update: upsert on key
            for row in pdf.itertuples(index=False):
                rec = row._asdict()
                state["upsert"][tuple(rec[k] for k in key_cols)] = rec

    q = (
        stream_df.writeStream.outputMode(output_mode)
        .foreachBatch(sink)
        .option("checkpointLocation", chkpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(chkpt, ignore_errors=True)
    if output_mode == "update":
        return pd.DataFrame(list(state["upsert"].values()))
    if not state["frames"]:
        return pd.DataFrame()
    return pd.concat(state["frames"], ignore_index=True)
