"""Deterministic hash sampling/splitting: membership must be a pure
function of the row key — stable under repartition and corpus growth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_chicago_crimes_spark.operators.sampling import (
    hash_bucket,
    hash_sample,
    hash_split,
)


def test_sample_fraction_and_determinism(spark):
    df = spark.createDataFrame([(i,) for i in range(10_000)], "id long")
    s1 = {r.id for r in hash_sample(df, "id", 0.2).collect()}
    s2 = {r.id for r in hash_sample(df.repartition(7), "id", 0.2).collect()}
    assert s1 == s2  # partitioning-independent
    assert 0.15 < len(s1) / 10_000 < 0.25  # ~20%


def test_growth_never_moves_existing_rows(spark):
    """Adding rows must not change any existing row's membership — the
    property seeded RNG sampling does NOT have."""
    small = spark.createDataFrame([(i,) for i in range(1_000)], "id long")
    big = spark.createDataFrame([(i,) for i in range(5_000)], "id long")
    s_small = {r.id for r in hash_sample(small, "id", 0.3).collect()}
    s_big = {r.id for r in hash_sample(big, "id", 0.3).collect()}
    assert s_small == {i for i in s_big if i < 1_000}


def test_split_partitions_all_rows_disjointly(spark):
    df = spark.createDataFrame([(i,) for i in range(5_000)], "id long")
    out = hash_split(df, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 5_000
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # per-row assignment is single-valued by construction (one when-chain)
    assert out.select("id").distinct().count() == 5_000


def test_split_fractions_must_sum_to_one(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(df, "id", {"a": 0.5, "b": 0.2})


def test_split_rejects_fraction_rounding_to_empty_split(spark):
    """0.004 of 100 buckets rounds to 0 — must raise, not silently emit
    an empty split."""
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="round to 0"):
        hash_split(df, "id", {"train": 0.996, "tiny": 0.004}, buckets=100)
    # same fractions work with enough buckets
    out = hash_split(df, "id", {"train": 0.996, "tiny": 0.004}, buckets=1000)
    assert out.columns[-1] == "split"


def test_split_rejects_boundaries_not_covering_bucket_space(spark):
    """Three thirds of 100 buckets round to 33+33+33=99 — the leftover
    bucket must raise, not silently land in the last split."""
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="cover 99 of 100"):
        hash_split(df, "id", {"a": 1 / 3, "b": 1 / 3, "c": 1 / 3}, buckets=100)
    # a bucket count divisible by 3 partitions exactly
    out = hash_split(df, "id", {"a": 1 / 3, "b": 1 / 3, "c": 1 / 3}, buckets=99)
    assert out.count() == 1


def test_bucket_uniformity(spark):
    df = spark.createDataFrame([(i,) for i in range(20_000)], "id long")
    buckets = (
        df.select(hash_bucket("id", 10).alias("b"))
        .groupBy("b")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    ns = [r.n for r in buckets]
    assert len(ns) == 10
    assert max(ns) / min(ns) < 1.2  # roughly uniform
