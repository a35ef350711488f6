"""Deterministic sampling/splitting queries over documents (extension
surface: reproducible dataset curation). Both are fully oracle-checked —
the md5 hash bucketing is engine-portable by construction, which is the
point: the same row lands in the same sample/split in Spark, DuckDB, or
anything else with md5."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_chicago_crimes_spark.operators.sampling import hash_sample, hash_split
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
