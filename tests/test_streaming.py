"""Structured Streaming must produce the SAME result as the batch plan
over the same parquet input — stream/batch symmetry is the engine's
streaming correctness contract."""

from __future__ import annotations

from big_data_chicago_crimes_spark.sources.readers import load_table
from big_data_chicago_crimes_spark.streaming import (
    read_events_stream,
    run_stream_to_memory,
    tumbling_window_agg,
)


def test_stream_matches_batch_tumbling(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    assert stream.isStreaming
    streamed = run_stream_to_memory(
        tumbling_window_agg(stream), "stream_tumbling_test", output_mode="complete"
    )
    batch = tumbling_window_agg(load_table(spark, sf_dir, "events"))
    s_rows = {tuple(r) for r in streamed.collect()}
    b_rows = {tuple(r) for r in batch.collect()}
    assert s_rows == b_rows
    assert len(s_rows) > 0
