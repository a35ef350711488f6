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


def test_stream_parquet_sink_with_checkpoint(spark, sf_dir, tmp_path):
    """readStream → windowed agg → parquet writeStream with checkpoint:
    the durable-sink path (exactly-once via checkpoint + file manifest).
    Append mode requires a watermark-closed aggregation, so use the
    stateless projection path; the aggregate path is covered by the
    memory-sink tests."""
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = read_events_stream(spark, sf_dir)
    enriched = stream.selectExpr(
        "event_id", "user_id", "event_type", "date_trunc('hour', ts) AS hour_bucket"
    )
    q = (
        enriched.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    written = spark.read.parquet(out)
    batch_n = load_table(spark, sf_dir, "events").count()
    assert written.count() == batch_n
    # restart with same checkpoint: no reprocessing, no duplicates
    q2 = (
        enriched.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert spark.read.parquet(out).count() == batch_n


def test_streaming_dedup_drops_redelivered_events(spark, tmp_path):
    """streaming_dedup keeps the FIRST arrival per event_id and drops
    re-deliveries landing in later microbatches (at-least-once source →
    exactly-once-per-key downstream). Two files → two microbatches with
    maxFilesPerTrigger=1; the second re-delivers event 1."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_chicago_crimes_spark.schemas import EVENTS_RAW_SCHEMA
    from big_data_chicago_crimes_spark.streaming import streaming_dedup

    from pyspark.sql import functions as F

    src = tmp_path / "stream_src"
    src.mkdir()
    base_ns = 1_600_000_000 * 10**9

    def write(name, rows):
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([base_ns + r[1] * 10**9 for r in rows], pa.int64()),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array(["view"] * len(rows)),
                "value": pa.array([1.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        )
        pq.write_table(tbl, str(src / name))

    write("batch1.parquet", [(1, 0), (2, 10)])
    write("batch2.parquet", [(1, 20), (3, 30)])  # event 1 re-delivered

    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    stream = raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    deduped = streaming_dedup(stream, ["event_id"], watermark="1 hour")
    out = run_stream_to_memory(deduped, "stream_dedup_test", output_mode="append")
    ids = sorted(r.event_id for r in out.select("event_id").collect())
    assert ids == [1, 2, 3]

    # batch mode: same call degrades to keyed dedup
    batch = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "event_id long, x string"
    )
    assert streaming_dedup(batch, ["event_id"]).count() == 2
