"""Source/sink tests: the cached() Parquet memoizer (the generalization
of the reference's 12 probe blocks) and partitioned writes."""

from __future__ import annotations

from big_data_chicago_crimes_spark.sources.sinks import cached, path_exists, write_parquet


def test_cached_computes_once(spark, tmp_path):
    target = str(tmp_path / "memo.parquet")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(10).withColumnRenamed("id", "v")

    first = cached(spark, target, build)
    assert first.count() == 10 and calls["n"] == 1
    second = cached(spark, target, build)
    assert second.count() == 10 and calls["n"] == 1  # served from parquet
    assert path_exists(spark, target)


def test_partitioned_write_prunes(spark, tmp_path):
    target = str(tmp_path / "part.parquet")
    df = spark.range(100).selectExpr("id", "CAST(id % 4 AS INT) AS bucket")
    write_parquet(df, target, partition_by=["bucket"])
    back = spark.read.parquet(target)
    pruned = back.filter("bucket = 2")
    assert pruned.count() == 25
    # partition pruning visible in the physical plan
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "bucket" in plan
