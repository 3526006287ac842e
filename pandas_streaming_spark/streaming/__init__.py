"""Structured Streaming surface: deterministic replay harness + stateful
operators (SURVEY.md §2.5, FIXTURES.md replay protocol)."""

from pandas_streaming_spark.streaming.replay import (  # noqa: F401
    replay_events,
    run_stream_to_df,
    run_stream_to_final,
    write_replay_batches,
)
