"""Sources & sinks (SURVEY.md §2.1) — the reference's source surface
re-expressed as Structured Streaming readers.

Reference -> here:
- ``from_textfile(path)`` / ``filenames(path)``  -> text_dir / file_stream
  (directory-granular tailing; ``input_file_name()`` exposes the name)
- ``from_kafka(_batched)``                       -> kafka (declared; no
  broker in the sandbox — checkpointed offsets give exactly-once, a
  strict upgrade over the reference's ref-counted at-least-once)
- ``from_tcp(port)``                             -> socket_lines
- ``from_iterable(it)``                          -> from_iterable (batch)
  / streaming via the replay protocol (streaming.replay)
- ``PeriodicDataFrame/Random(freq)``             -> rate (synthetic timed)
- sinks: ``sink/sink_to_list/to_textfile``       -> foreachBatch /
  memory / file sinks on writeStream (see api.StreamingFrame sinks)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def file_stream(
    spark: SparkSession,
    path: str,
    schema,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = 1,
    **options,
) -> DataFrame:
    """Watch a directory; each new file becomes (part of) a micro-batch —
    the engine's form of the reference's file-tail/filenames sources."""
    r = spark.readStream.schema(schema)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    for k, v in options.items():
        r = r.option(k, v)
    return r.format(fmt).load(path)


def text_dir(spark: SparkSession, path: str) -> DataFrame:
    """Stream lines from text files appearing under ``path`` (column
    ``value``); add ``input_file_name()`` for per-file provenance."""
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType([StructField("value", StringType())])
    return file_stream(spark, path, schema, fmt="text")


def rate(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Synthetic timed source (reference PeriodicDataFrame/Random):
    columns (timestamp, value)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


def socket_lines(spark: SparkSession, host: str, port: int) -> DataFrame:
    """TCP line source (reference from_tcp). Test-only source upstream —
    same caveat here."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )


def kafka(
    spark: SparkSession,
    topics: str,
    bootstrap_servers: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka source (declared; unexercised in the sandbox — no broker).
    With a checkpoint dir the source replays from logged offsets for
    exactly-once processing."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def from_iterable(spark: SparkSession, rows, schema) -> DataFrame:
    """Batch frame from a Python iterable (reference from_iterable).
    For a *streaming* equivalent use streaming.replay.write_replay_batches
    (file-drop protocol) — iterables aren't replayable, files are."""
    return spark.createDataFrame(list(rows), schema)
