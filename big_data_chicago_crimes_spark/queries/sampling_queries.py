"""Deterministic sampling/splitting queries over documents (extension
surface: reproducible dataset curation). Both are fully oracle-checked —
the md5 hash bucketing is engine-portable by construction, which is the
point: the same row lands in the same sample/split in Spark, DuckDB, or
anything else with md5."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_chicago_crimes_spark.operators.sampling import (
    hash_sample,
    hash_split,
    stratified_hash_sample,
)
from big_data_chicago_crimes_spark.plans.registry import register
from big_data_chicago_crimes_spark.sources.readers import load_tables

_BUCKET_SQL = (
    "('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100"
)


@register(
    "docs_hash_sample",
    oracle=f"""
        SELECT lang, COUNT(*) AS n_docs
        FROM documents
        WHERE {_BUCKET_SQL} < 20
        GROUP BY lang ORDER BY lang
    """,
    tags=("sampling", "extension"),
)
def docs_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~20% sample by doc_id content hash, per-lang census.
    Unlike df.sample(seed), membership survives repartition, retries,
    engine changes, and corpus growth — the reproducibility contract a
    training-data pipeline needs, proven here by the DuckDB oracle
    computing the identical sample."""
    t = load_tables(spark, sf_dir)
    return (
        hash_sample(t.documents, "doc_id", 0.2)
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang")
    )


@register(
    "docs_train_val_test_split",
    oracle=f"""
        SELECT CASE WHEN {_BUCKET_SQL} < 80 THEN 'train'
                    WHEN {_BUCKET_SQL} < 90 THEN 'val'
                    ELSE 'test' END AS split,
               lang, COUNT(*) AS n_docs
        FROM documents
        GROUP BY split, lang ORDER BY split, lang
    """,
    tags=("sampling", "split", "extension"),
)
def docs_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment by doc_id hash bucket, counted
    per (split, lang). Per-row-deterministic: new corpus rows never move
    existing rows between splits."""
    t = load_tables(spark, sf_dir)
    split = hash_split(
        t.documents, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return (
        split.groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("split", "lang")
    )


@register(
    "docs_stratified_sample",
    oracle=f"""
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents
        WHERE {_BUCKET_SQL} < CASE lang WHEN 'en' THEN 10
                                        WHEN 'de' THEN 50
                                        WHEN 'zh' THEN 100
                                        ELSE 25 END
        GROUP BY lang ORDER BY lang
    """,
    tags=("sampling", "stratified", "extension"),
)
def docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling census: down-sample the
    dominant language (en → 10%), keep all of a rare one (zh → 100%),
    intermediate fractions elsewhere — the corpus-rebalancing move,
    with hash_sample's reproducibility contract per stratum. Because the
    bucket hash ignores the stratum, changing one stratum's fraction
    never reshuffles another's membership."""
    t = load_tables(spark, sf_dir)
    sampled = stratified_hash_sample(
        t.documents,
        "doc_id",
        "lang",
        {"en": 0.1, "de": 0.5, "zh": 1.0},
        default_fraction=0.25,
    )
    return (
        sampled.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang")
    )
