"""Multimodal-plumbing queries: binary payload columns + Arrow-batched
decode (deterministic fake kernel — see operators/multimodal.py) +
frame sampling. The byte-arithmetic parts are SQL-expressible, so the
plumbing itself gets a DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_chicago_crimes_spark.operators.multimodal import (
    attach_binary_payload,
    decode_media,
    resize_media,
    sample_frames,
)
from big_data_chicago_crimes_spark.plans.registry import register
from big_data_chicago_crimes_spark.sources.readers import load_tables


@register(
    "multimodal_pipeline_stats",
    # r7 merge of multimodal_decode_stats + multimodal_frame_sample_counts
    # (the purchaser_error_overlap precedent): BOTH multimodal transforms —
    # the Arrow-batched mapInPandas decode kernel and the sequence+explode
    # frame fan-out — hash-certify in ONE registry slot, funding a new
    # query's place in the 50-entry driver window. The oracle replays the
    # decode kernel's deterministic byte arithmetic and the 100-byte frame
    # count per source. r13: + 'resized_bytes' leg — the resize_media
    # mapInPandas stage (8×8 target so the 192-byte clip BINDS on part of
    # the fixture: payloads span 48–553 bytes; a non-binding cap would
    # certify a pass-through).
    oracle="""
        SELECT source,
               COUNT(*) AS n_media,
               ROUND(AVG(octet_length(encode(text)) % 640 + 1), 6) AS avg_fake_width,
               CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
               CAST(SUM(CAST(floor(greatest(octet_length(encode(text)) - 1, 0) / 100)
                    AS BIGINT) + 1) AS BIGINT) AS n_frames,
               CAST(SUM(LEAST(octet_length(encode(text)), 8 * 8 * 3)) AS BIGINT)
                    AS resized_bytes
        FROM documents GROUP BY source ORDER BY source
    """,
    tags=("multimodal", "extension"),
)
def multimodal_pipeline_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multimodal plumbing in one result, per source: binary
    ingestion → mapInPandas decode (Arrow-batched on executors) for
    media/width/byte stats, frame sampling (explode one row per
    100-byte "frame" — the fan-out transform of a video pipeline, pure
    column ops, no Python) for frame counts, and the resize stage
    (second Arrow-batched kernel, 8×8 target whose byte clip binds on
    part of the fixture) for post-resize byte totals."""
    t = load_tables(spark, sf_dir)
    media = attach_binary_payload(t.documents)
    decoded = decode_media(media)
    decode_stats = (
        decoded.join(t.documents.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_media"),
            F.round(F.avg("fake_width"), 6).alias("avg_fake_width"),
            F.sum("n_bytes").alias("total_bytes"),
        )
    )
    frames = sample_frames(media, every_n_bytes=100)
    frame_stats = (
        frames.join(t.documents.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.count("*").alias("n_frames"))
        .withColumnRenamed("source", "f_source")
    )
    resized = resize_media(media, target_w=8, target_h=8)
    resize_stats = (
        resized.join(t.documents.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.sum("n_bytes_out").alias("resized_bytes"))
        .withColumnRenamed("source", "r_source")
    )
    # null-safe equality: a plain join on the group key would silently
    # drop a NULL source group (NULL != NULL) that the one-pass oracle
    # emits; eqNullSafe keeps the merge oracle-equivalent for any data
    return (
        decode_stats.join(
            frame_stats, decode_stats["source"].eqNullSafe(frame_stats["f_source"])
        )
        .drop("f_source")
        .join(
            resize_stats,
            decode_stats["source"].eqNullSafe(resize_stats["r_source"]),
        )
        .drop("r_source")
        .orderBy("source")
    )
