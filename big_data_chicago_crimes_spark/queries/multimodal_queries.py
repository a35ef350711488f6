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
    sample_frames,
)
from big_data_chicago_crimes_spark.plans.registry import register
from big_data_chicago_crimes_spark.sources.readers import load_tables


@register(
    "multimodal_decode_stats",
    oracle="""
        SELECT d.source,
               COUNT(*) AS n_media,
               ROUND(AVG(octet_length(encode(d.text)) % 640 + 1), 6) AS avg_fake_width,
               CAST(SUM(octet_length(encode(d.text))) AS BIGINT) AS total_bytes
        FROM documents d GROUP BY d.source ORDER BY d.source
    """,
    tags=("multimodal", "extension"),
)
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary ingestion → mapInPandas decode → metadata aggregate. The
    decode kernel runs Arrow-batched on executors; the oracle replays
    its deterministic byte arithmetic."""
    t = load_tables(spark, sf_dir)
    media = attach_binary_payload(t.documents)
    decoded = decode_media(media)
    stats = decoded.join(t.documents.select("doc_id", "source"), "doc_id")
    return (
        stats.groupBy("source")
        .agg(
            F.count("*").alias("n_media"),
            F.round(F.avg("fake_width"), 6).alias("avg_fake_width"),
            F.sum("n_bytes").alias("total_bytes"),
        )
        .orderBy("source")
    )


@register(
    "multimodal_frame_sample_counts",
    oracle="""
        SELECT lang,
               CAST(SUM(CAST(floor(greatest(octet_length(encode(text)) - 1, 0) / 100)
                    AS BIGINT) + 1) AS BIGINT) AS n_frames
        FROM documents GROUP BY lang ORDER BY lang
    """,
    tags=("multimodal", "extension"),
)
def multimodal_frame_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (explode one row per 100-byte "frame") summarized
    per lang — the fan-out transform of a video pipeline, pure column
    ops (sequence+explode, no Python)."""
    t = load_tables(spark, sf_dir)
    media = attach_binary_payload(t.documents)
    frames = sample_frames(media, every_n_bytes=100)
    with_lang = frames.join(t.documents.select("doc_id", "lang"), "doc_id")
    return (
        with_lang.groupBy("lang").agg(F.count("*").alias("n_frames")).orderBy("lang")
    )
