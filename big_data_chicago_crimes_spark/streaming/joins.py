"""Stream-stream joins, batch/stream symmetric.

The other streaming shapes (windowed aggs, session windows, dedup,
custom state) are covered in windows.py / stateful.py; this module adds
the remaining first-class Structured Streaming operator: the
watermarked stream-stream INTERVAL join ("purchases joined to the views
that preceded them within N minutes"), the streaming counterpart of the
batch as-of/interval analysis in operators/asof.py.

Semantics and scale shape: both inputs carry event-time watermarks and
the join condition carries a time-range bound, so Spark can (a) buffer
only the range-bounded slice of each side in the state store and (b)
evict state once the watermark passes — without the range bound a
stream-stream join's state grows forever. The builder is batch/stream
symmetric: over batch frames it degrades to a plain range join, which is
what the equality test exploits (same builder, both modes, identical
rows — tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _interval_seconds(window: str) -> int | None:
    """'6 hours' / '30 minutes' → seconds; None when the phrase is not a
    single (quantity, unit) pair this parser knows (caller falls back to
    the un-binned plan — a performance choice, never a semantic one)."""
    parts = window.strip().split()
    if len(parts) != 2:
        return None
    mult = {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
        "day": 86400, "days": 86400,
    }.get(parts[1].lower())
    try:
        qty = int(parts[0])
    except ValueError:
        return None
    return qty * mult if mult and qty > 0 else None


def purchases_after_views_interval_join(
    purchases: DataFrame,
    views: DataFrame,
    window: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Each purchase joined to EVERY view by the same user within
    ``window`` before it (inner, possibly many views per purchase — the
    attribution fan-out; the one-row as-of variant is the batch
    operator's job). Columns are prefixed per side so the same builder
    works whether inputs are streaming or batch.

    Batch inputs take a BINNED plan (guide §3 — avoid the exploding
    range join): the time axis is bucketed at the window width, each
    purchase probes its own bucket and the previous one, and the join
    becomes an equi-join on (user, bucket) with the original range
    predicate as residual. Every qualifying view lies in exactly one of
    the two probed buckets (v_ts ∈ [p_ts − W, p_ts] ⇒ ⌊v/W⌋ ∈ {⌊p/W⌋−1,
    ⌊p/W⌋}), and each (purchase, view) pair matches exactly one probe
    row — identical rows, no dedup. Without binning the equi key is
    user_id alone, so per-user candidates grow quadratically as events
    per user grow (measured sf1: 26.8M pairs tested, 222K qualifying —
    99% of the join's work failing the residual); the bucket key bounds
    candidates to a ≤2-window slice per purchase AND splits hot users
    across time. Streaming keeps the raw interval condition — that
    range bound is what lets Spark size and evict the state store."""
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    v = views.select(F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"))
    if purchases.isStreaming:
        p = p.withWatermark("p_ts", watermark)
    if views.isStreaming:
        v = v.withWatermark("v_ts", watermark)
    residual = (F.col("v_ts") <= F.col("p_ts")) & (
        F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {window}")
    )
    win_s = _interval_seconds(window)
    if not (purchases.isStreaming or views.isStreaming) and win_s is not None:
        w_us = F.lit(win_s * 1_000_000)
        probe = p.withColumn(
            "__b",
            F.explode(
                F.array(
                    F.floor(F.unix_micros("p_ts") / w_us),
                    F.floor(F.unix_micros("p_ts") / w_us) - 1,
                )
            ),
        )
        binned = v.withColumn("__vb", F.floor(F.unix_micros("v_ts") / w_us))
        cond = (
            (F.col("p_user") == F.col("v_user"))
            & (F.col("__b") == F.col("__vb"))
            & residual
        )
        return probe.join(binned, cond, "inner").select(
            "p_user", "purchase_id", "p_ts", "v_ts"
        )
    cond = (F.col("p_user") == F.col("v_user")) & residual
    return p.join(v, cond, "inner").select("p_user", "purchase_id", "p_ts", "v_ts")


def dedup_stream_against_corpus(
    docs: DataFrame,
    corpus_fingerprints: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-STATIC anti-join dedup — the ingest edge of the
    incremental pipeline (batch counterpart:
    operators/dedup.py:incremental_exact_dedup, driver-certified as
    docs_incremental_dedup): each incoming document is dropped if its
    normalized-text fingerprint already exists in the STATIC corpus
    index, then first-arrival-wins within the stream itself.

    Structured Streaming executes the stream-static left-anti join
    per micro-batch with NO state store (the static side is just a
    batch relation, broadcast when small — exactly the fingerprint
    index's shape); only the in-stream dedup keeps state, bounded by
    the watermark when ``ts_col`` is given
    (dropDuplicatesWithinWatermark) and unbounded otherwise — pass a
    ``ts_col`` for any long-running ingest.

    Batch degradation: the same calls run as a plain anti-join plus
    keyed dedup; batch keeps an arbitrary row per fingerprint (where
    min-id semantics matter, use ``incremental_exact_dedup``). WITHOUT
    ``ts_col`` the survivors' FINGERPRINT SET is identical between
    stream and batch — what the stream-vs-batch equality test pins.
    WITH ``ts_col`` the in-stream dedup is scoped to the watermark
    horizon (that bounded state is the point): a re-arrival later than
    the watermark is re-emitted, so long-horizon exactness must come
    from the downstream index (the ``ingest_with_incremental_dedup``
    loop, whose fingerprint anti-join has no horizon), not from this
    operator's state.
    """
    from big_data_chicago_crimes_spark.operators.dedup import doc_fingerprint

    keyed = docs.withColumn("fingerprint", doc_fingerprint(text_col))
    fresh = keyed.join(
        corpus_fingerprints.select("fingerprint"), "fingerprint", "left_anti"
    )
    if docs.isStreaming and ts_col is not None:
        return fresh.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["fingerprint"]
        )
    return fresh.dropDuplicates(["fingerprint"])


def ingest_with_incremental_dedup(
    docs_stream: DataFrame,
    accepted_path: str,
    index_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """The full incremental-ingest loop as a ``foreachBatch`` stream: each
    micro-batch is deduped against the CURRENT fingerprint index
    (operators/dedup.py:incremental_exact_dedup — in-batch min-id dedup
    plus a fingerprint anti-join), accepted rows are appended to
    ``accepted_path``, and their fingerprints are appended to
    ``index_path`` — so a document accepted in micro-batch N is rejected
    as a duplicate in micro-batch N+1, across RESTARTS, without any
    state store.

    Why foreachBatch instead of the stream-static join
    (``dedup_stream_against_corpus``): a stream-static join resolves the
    static side's file listing at plan time, so appends made DURING the
    run are not guaranteed visible to later micro-batches; inside
    foreachBatch every batch is plain batch Spark — the index read is
    fresh by construction.

    Replay idempotence (ADVICE r8): both outputs carry ``batch_id``,
    and a replayed micro-batch first checks which of its two appends
    already landed — fully-processed batches are skipped outright, and
    a crash BETWEEN the appends resumes by deriving the missing
    fingerprint rows from the already-written accepted rows (never by
    re-running the dedup, whose answer could differ against the
    now-partial index). The accepted table therefore converges to
    exactly one row per accepted document under any crash/replay
    interleaving — no downstream dedup needed.

    Returns the started StreamingQuery; caller awaits/stops it.
    """

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        ingest_process_batch(
            batch_df, batch_id, accepted_path, index_path, text_col, id_col
        )

    return (
        docs_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )


def ingest_process_batch(
    batch_df: DataFrame,
    batch_id: int,
    accepted_path: str,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """One micro-batch of the ingest loop, idempotent under replay —
    module-level so the replay contract is unit-testable without
    forcing a checkpoint recovery (tests/test_streaming.py calls it
    twice with the same batch_id and asserts no duplicate rows)."""
    from big_data_chicago_crimes_spark.operators.dedup import (
        doc_fingerprint,
        incremental_exact_dedup,
    )
    from pyspark.errors import AnalysisException

    from big_data_chicago_crimes_spark.sources.sinks import path_exists

    spark = batch_df.sparkSession

    def _has_batch(path: str) -> bool:
        if not path_exists(spark, path):
            return False
        # mergeSchema: a table whose OLD files predate the batch_id
        # column must not hide it — default schema inference samples one
        # file, so on an upgraded deployment an old file could make this
        # return False for an already-written batch and let the replay
        # path double-append accepted rows (ADVICE r9). Merging unions
        # the schemas; pre-batch_id rows read as NULL and never match.
        try:
            df = spark.read.option("mergeSchema", "true").parquet(path)
        except AnalysisException:
            # the directory exists but holds no committed parquet files
            # (a crash during the very first write's job commit leaves
            # only _temporary/): no committed files means no batch —
            # treating the unreadable dir as "done" or crashing here
            # would wedge every replay of that micro-batch
            return False
        if "batch_id" not in df.columns:
            return False
        return bool(df.filter(F.col("batch_id") == batch_id).head(1))

    def _index_rows(frame: DataFrame) -> DataFrame:
        # the ONE index row shape, shared by the normal path and the
        # crash-recovery branch so the two can never silently diverge
        return frame.select(
            doc_fingerprint(text_col).alias("fingerprint"),
            F.lit(batch_id).alias("batch_id"),
        )

    # NOTE the replay probe costs two mergeSchema footer scans per
    # micro-batch, growing with table size (O(N²) footer reads over a
    # run). A production deployment amortizes it with a committed-batch
    # marker (e.g. partition the appends by batch_id and probe directory
    # existence, falling back to this row probe only when the marker is
    # ambiguous); the row probe stays the correctness ground truth.
    acc_done = _has_batch(accepted_path)
    idx_done = _has_batch(index_path)
    if acc_done and idx_done:
        return  # fully-processed replay
    if acc_done:
        # crashed between the two appends: finish the index append FROM
        # the rows the first attempt accepted (re-running the dedup
        # against the partial index would re-accept nothing — the
        # fingerprints must come from what was actually written)
        # mergeSchema here too: this read filters on batch_id, so the
        # same legacy-footer sampling hazard _has_batch guards against
        # applies (an old file without the column would raise
        # UNRESOLVED_COLUMN on every replay and wedge the stream)
        _index_rows(
            spark.read.option("mergeSchema", "true")
            .parquet(accepted_path)
            .filter(F.col("batch_id") == batch_id)
        ).write.mode("append").parquet(index_path)
        return

    if path_exists(spark, index_path):
        index = spark.read.parquet(index_path)
    else:
        index = spark.createDataFrame([], "fingerprint string")
    accepted = incremental_exact_dedup(batch_df, index, text_col, id_col)
    # persist: the two writes below would otherwise each re-run the
    # whole dedup (scan + groupBy + anti/semi joins) — and a
    # nondeterministic plan could let the two writes disagree
    accepted = accepted.withColumn("batch_id", F.lit(batch_id)).persist()
    try:
        # fingerprints first would lose rows on a crash between writes;
        # rows first lets the replay branch above finish the index
        # append from the accepted rows — crash-ordering chosen
        # deliberately
        accepted.write.mode("append").parquet(accepted_path)
        _index_rows(accepted).write.mode("append").parquet(index_path)
    finally:
        accepted.unpersist()
