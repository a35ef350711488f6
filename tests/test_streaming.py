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
    """Stream and batch must agree over the REAL testdata events file —
    and the agreement must be non-vacuous: in round 4 a broken ts
    conversion corrupted BOTH sides identically (30 days of events →
    2 windows of 1970), so equality alone proved nothing. Pin the
    window volume and epoch too."""
    stream = read_events_stream(spark, sf_dir)
    assert stream.isStreaming
    streamed = run_stream_to_memory(
        tumbling_window_agg(stream), "stream_tumbling_test", output_mode="complete"
    )
    batch = tumbling_window_agg(load_table(spark, sf_dir, "events"))
    s_rows = {tuple(r) for r in streamed.collect()}
    b_rows = {tuple(r) for r in batch.collect()}
    assert s_rows == b_rows
    # ~30 days of synthetic events × hourly windows × event types: the
    # corrupted read yielded 2 distinct window_starts; a correct one
    # yields hundreds, all in a modern epoch.
    starts = {r[0] for r in s_rows}
    assert len(starts) > 100, f"suspiciously few windows: {len(starts)}"
    assert all(s >= "2000-01-01" for s in starts), sorted(starts)[:3]


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


def test_watermark_drops_late_events(spark, tmp_path):
    """Late-data semantics: an event older than the watermark when its
    microbatch arrives must NOT resurrect its (already finalized)
    window. Batch 1 closes window [10:00,11:00) by advancing the
    watermark past it; batch 2 re-delivers a 10:15 event, which append
    mode must discard rather than re-emit the window."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from big_data_chicago_crimes_spark.schemas import EVENTS_RAW_SCHEMA
    from big_data_chicago_crimes_spark.streaming import tumbling_window_agg

    src = tmp_path / "late_src"
    src.mkdir()
    base = 1_600_000_000  # epoch seconds, aligned enough for hour windows
    hour = 3600

    def write(name, secs):
        tbl = pa.table(
            {
                "event_id": pa.array(list(range(len(secs))), pa.int64()),
                "ts": pa.array([(base + s) * 10**9 for s in secs], pa.int64()),
                "user_id": pa.array([1] * len(secs), pa.int64()),
                "event_type": pa.array(["view"] * len(secs)),
                "value": pa.array([1.0] * len(secs)),
                "props": pa.array(["{}"] * len(secs)),
            }
        )
        pq.write_table(tbl, str(src / name))

    import time as _time

    # find the hour boundary at/after base
    h0 = (base // hour + 1) * hour - base  # offset to next boundary
    # batch 1: two events in window W0=[h0, h0+1h), one 4 hours ahead
    # (its event time puts the 2h watermark past W0's end)
    write("b1.parquet", [h0 + 60, h0 + 120, h0 + 4 * hour])
    _time.sleep(1.1)  # distinct modTimes keep the file order deterministic
    # batch 2: one more event — the watermark computed from batch 1
    # becomes OPERATIVE in this batch (it lags one microbatch)
    write("b2.parquet", [h0 + 4 * hour + 60])
    _time.sleep(1.1)
    # batch 3: the late re-delivery inside W0, now behind the watermark
    write("b3.parquet", [h0 + 300])

    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    stream = raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    agg = tumbling_window_agg(stream, width="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_drop_test")
        .start()
    )
    try:
        q.processAllAvailable()
        dropped = sum(
            op.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for op in p["stateOperators"]
        )
    finally:
        q.stop()
    rows = spark.table("late_drop_test").collect()
    by_window = {r.window_start: r.cnt for r in rows}
    # W0 was emitted with its ON-TIME count only; the late event was
    # dropped by the watermark, not aggregated or re-emitted
    assert 2 in by_window.values(), by_window
    assert 3 not in by_window.values(), by_window
    assert dropped == 1


def test_stream_stream_interval_join_matches_batch(spark, sf_dir):
    """Watermarked stream-stream interval join (purchases x prior views
    within 30 min) must emit exactly the batch range join's rows — the
    remaining first-class streaming operator, same-builder both modes."""
    from big_data_chicago_crimes_spark.streaming import (
        purchases_after_views_interval_join,
    )

    def split(df):
        return (
            df.filter(df.event_type == "purchase"),
            df.filter(df.event_type == "view"),
        )

    batch = load_table(spark, sf_dir, "events")
    bp, bv = split(batch)
    expected = sorted(
        map(str, purchases_after_views_interval_join(bp, bv).collect())
    )
    assert expected  # the fixture must actually exercise the join

    sp, sv = split(read_events_stream(spark, sf_dir))
    joined = purchases_after_views_interval_join(sp, sv)
    out = run_stream_to_memory(joined, "stream_interval_join_test", "append")
    assert sorted(map(str, out.collect())) == expected


def test_hash_sampling_filters_apply_to_streams(spark, sf_dir):
    """The curation membership functions (hash_sample & friends) are
    stateless content-hash filters, so the SAME recipe runs in the
    ingest stream — streamed sample must equal the batch sample."""
    from big_data_chicago_crimes_spark.operators.sampling import hash_sample

    batch = load_table(spark, sf_dir, "events")
    expected = sorted(
        r.event_id for r in hash_sample(batch, "event_id", 0.2).collect()
    )
    assert expected

    stream = read_events_stream(spark, sf_dir)
    sampled = hash_sample(stream, "event_id", 0.2).select("event_id")
    out = run_stream_to_memory(sampled, "stream_hash_sample_test", "append")
    assert sorted(r.event_id for r in out.collect()) == expected


def test_stream_static_dedup_matches_batch(spark, tmp_path):
    """Stream-STATIC anti-join dedup (dedup_stream_against_corpus): docs
    arriving over two micro-batches drop (a) anything whose fingerprint
    the static corpus index holds and (b) later re-arrivals of a
    fingerprint already seen in the stream. The surviving FINGERPRINT
    set must equal the batch degradation's over the same input (which
    copy of a dup survives is arrival-order-dependent by design)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_chicago_crimes_spark.operators.dedup import doc_fingerprint
    from big_data_chicago_crimes_spark.streaming import run_stream_to_memory
    from big_data_chicago_crimes_spark.streaming.joins import (
        dedup_stream_against_corpus,
    )

    src = tmp_path / "docs_src"
    src.mkdir()

    def write(name, rows):
        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
            }
        )
        pq.write_table(tbl, str(src / name))

    write("crawl1.parquet", [(10, "fresh content"), (11, "known document")])
    write(
        "crawl2.parquet",
        [(12, "Fresh   Content"), (13, "also brand new"), (14, "fresh content")],
    )

    corpus = spark.createDataFrame(
        [(1, "known document"), (2, "another known one")],
        "doc_id long, text string",
    )
    corpus_fps = corpus.select(doc_fingerprint("text").alias("fingerprint"))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    assert stream.isStreaming
    out = run_stream_to_memory(
        dedup_stream_against_corpus(stream, corpus_fps),
        "stream_static_dedup_test",
        output_mode="append",
    )
    got = {r.fingerprint for r in out.select("fingerprint").collect()}

    batch = spark.read.schema("doc_id long, text string").parquet(str(src))
    expect = {
        r.fingerprint
        for r in dedup_stream_against_corpus(batch, corpus_fps)
        .select("fingerprint")
        .collect()
    }
    assert got == expect and len(got) == 2  # {fresh content, also brand new}
    # corpus-known fingerprint must be absent from the stream output
    known = corpus_fps.collect()[0].fingerprint
    assert known not in got


def test_foreachbatch_ingest_dedupes_across_microbatches(spark, tmp_path):
    """ingest_with_incremental_dedup closes the incremental loop: a doc
    accepted in micro-batch 1 must be REJECTED in micro-batch 2 (its
    fingerprint was appended to the index between batches), alongside
    in-batch dups and corpus-known dups."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_chicago_crimes_spark.streaming.joins import (
        ingest_with_incremental_dedup,
    )

    src = tmp_path / "crawls"
    src.mkdir()
    accepted = str(tmp_path / "accepted")
    index = str(tmp_path / "fp_index")
    ckpt = str(tmp_path / "ckpt")

    def write(name, rows):
        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
            }
        )
        pq.write_table(tbl, str(src / name))

    write("crawl1.parquet", [(10, "alpha doc"), (11, "beta doc"), (12, "Alpha   Doc")])
    write("crawl2.parquet", [(20, "ALPHA doc"), (21, "gamma doc")])

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = ingest_with_incremental_dedup(stream, accepted, index, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {r.doc_id for r in spark.read.parquet(accepted).collect()}
    # 10 (alpha, first arrival), 11 (beta), 21 (gamma); 12 in-batch dup,
    # 20 cross-micro-batch dup of 10 via the growing index
    assert got == {10, 11, 21}, got
    fps = [r.fingerprint for r in spark.read.parquet(index).collect()]
    assert len(fps) == 3 and len(set(fps)) == 3


def test_foreachbatch_ingest_survives_restart(spark, tmp_path):
    """The docstring's 'across RESTARTS' claim: stop the ingest query,
    add a new crawl re-delivering an already-accepted doc, start a NEW
    query on the SAME checkpoint — the restarted stream must process
    only the new file and reject the re-delivery via the persisted
    fingerprint index."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_chicago_crimes_spark.streaming.joins import (
        ingest_with_incremental_dedup,
    )

    src = tmp_path / "crawls"
    src.mkdir()
    accepted = str(tmp_path / "accepted")
    index = str(tmp_path / "fp_index")
    ckpt = str(tmp_path / "ckpt")

    def write(name, rows):
        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
            }
        )
        pq.write_table(tbl, str(src / name))

    def start():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        return ingest_with_incremental_dedup(stream, accepted, index, ckpt)

    write("crawl1.parquet", [(1, "first doc"), (2, "second doc")])
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert {r.doc_id for r in spark.read.parquet(accepted).collect()} == {1, 2}

    # restart on the same checkpoint; the new crawl re-delivers doc 1's
    # content under a fresh id and adds one genuinely new doc
    write("crawl2.parquet", [(10, "FIRST   doc"), (11, "third doc")])
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.doc_id for r in spark.read.parquet(accepted).collect()}
    assert got == {1, 2, 11}, got  # 10 rejected by the persisted index
    fps = [r.fingerprint for r in spark.read.parquet(index).collect()]
    assert len(fps) == 3 and len(set(fps)) == 3  # no re-appends on restart


def test_ingest_process_batch_replay_idempotent(spark, tmp_path):
    """The replay contract (ADVICE r8): re-running a micro-batch with
    the same batch_id — the checkpoint-recovery case — must not
    duplicate accepted rows or index fingerprints; and a crash BETWEEN
    the two appends (accepted written, index not) must be finished from
    the written accepted rows on replay."""
    from pyspark.sql import functions as F

    from big_data_chicago_crimes_spark.streaming.joins import ingest_process_batch

    accepted = str(tmp_path / "accepted")
    index = str(tmp_path / "fp_index")
    batch = spark.createDataFrame(
        [(1, "first doc"), (2, "second doc"), (3, "First   DOC")],
        "doc_id long, text string",
    )

    ingest_process_batch(batch, 0, accepted, index)
    ingest_process_batch(batch, 0, accepted, index)  # full replay: no-op
    acc = spark.read.parquet(accepted)
    assert sorted(r.doc_id for r in acc.collect()) == [1, 2]
    assert spark.read.parquet(index).count() == 2

    # crash between writes: batch 1's accepted rows land, index doesn't
    batch2 = spark.createDataFrame([(10, "third doc")], "doc_id long, text string")
    batch2.withColumn("batch_id", F.lit(1)).write.mode("append").parquet(accepted)
    ingest_process_batch(batch2, 1, accepted, index)  # replay finishes index
    assert spark.read.parquet(accepted).count() == 3  # no duplicate rows
    fps = [r.fingerprint for r in spark.read.parquet(index).collect()]
    assert len(fps) == 3 and len(set(fps)) == 3

    # batch 2 against the recovered index: the doc 10 twin is rejected
    batch3 = spark.createDataFrame(
        [(20, "THIRD doc"), (21, "fourth doc")], "doc_id long, text string"
    )
    ingest_process_batch(batch3, 2, accepted, index)
    got = sorted(r.doc_id for r in spark.read.parquet(accepted).collect())
    assert got == [1, 2, 10, 21], got


def test_ingest_replay_sees_batch_id_despite_legacy_files(spark, tmp_path):
    """Upgraded-deployment replay (ADVICE r9): when the accepted table
    holds OLD files written before the batch_id column existed, schema
    inference may sample a legacy file and hide batch_id — the replay
    probe must still see the already-written batch (mergeSchema) or it
    double-appends accepted rows."""
    from pyspark.sql import functions as F

    from big_data_chicago_crimes_spark.streaming.joins import ingest_process_batch

    accepted = str(tmp_path / "accepted")
    index = str(tmp_path / "fp_index")
    # legacy ingest: accepted rows with NO batch_id column, in MANY
    # files so post-merge inference would likely sample one of them
    legacy = spark.createDataFrame(
        [(i, f"legacy doc {i}") for i in range(8)], "doc_id long, text string"
    )
    legacy.repartition(8).write.mode("append").parquet(accepted)
    legacy.select(
        F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")).alias(
            "fingerprint"
        )
    ).write.mode("append").parquet(index)

    # new-version ingest writes batch 7, then the batch is replayed
    batch = spark.createDataFrame([(100, "novel doc")], "doc_id long, text string")
    ingest_process_batch(batch, 7, accepted, index)
    ingest_process_batch(batch, 7, accepted, index)  # replay: must no-op
    acc = spark.read.option("mergeSchema", "true").parquet(accepted)
    assert acc.filter(F.col("doc_id") == 100).count() == 1  # no double-append


def test_streaming_dedup_rejects_empty_key_list(spark):
    import pytest

    from big_data_chicago_crimes_spark.streaming.windows import streaming_dedup

    df = spark.createDataFrame([(1,)], "event_id long")
    with pytest.raises(ValueError, match="non-empty"):
        streaming_dedup(df, keys=[])


def test_ingest_recovers_from_empty_uncommitted_directory(spark, tmp_path):
    """A crash during the very first write's job commit leaves the
    directory existing with no committed parquet files — the replay
    probe must treat that as 'no batch written', not wedge the stream
    with an unable-to-infer-schema error."""
    import os

    from big_data_chicago_crimes_spark.streaming.joins import ingest_process_batch

    accepted = str(tmp_path / "accepted")
    index = str(tmp_path / "index")
    os.makedirs(accepted)  # exists, holds zero committed files
    batch = spark.createDataFrame([(1, "alpha beta")], "doc_id long, text string")
    ingest_process_batch(batch, 0, accepted, index)
    got = spark.read.parquet(accepted)
    assert got.count() == 1


def test_stream_matches_batch_windowed_distinct_hll(spark, sf_dir):
    """The chained two-aggregation HLL plan (register max -> per-window
    estimate) must run as a STREAM (multiple stateful operators, append
    mode) and agree with the batch form per window. Append mode emits
    only watermark-finalized windows, so the stream's rows are a prefix
    of the batch result: every emitted window must match its batch twin
    EXACTLY (integer sketch state included), and the emission must
    cover all but the trailing watermark horizon."""
    from big_data_chicago_crimes_spark.streaming import windowed_distinct_hll

    stream = read_events_stream(spark, sf_dir)
    streamed = run_stream_to_memory(
        windowed_distinct_hll(stream), "stream_hll_test", output_mode="append"
    )
    batch = windowed_distinct_hll(load_table(spark, sf_dir, "events"))

    def key(rows):
        return {
            r["w"]["start"]: (r["n_regs"], r["z_int"], r["hll_est"]) for r in rows
        }

    s, b = key(streamed.collect()), key(batch.collect())
    assert s, "append-mode stream emitted nothing"
    for w, state in s.items():
        assert state == b[w], (w, state, b[w])
    # hourly windows over ~30 days ≈ 700+; the 2h watermark may hold
    # back only the trailing horizon
    assert len(s) > 100 and len(s) >= len(b) - 4, (len(s), len(b))
