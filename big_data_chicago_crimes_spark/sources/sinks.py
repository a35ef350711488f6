"""Sinks + the Parquet result-cache memoizer.

The reference hand-rolls the same cache-or-compute block twelve times
(probe via Hadoop ``FileSystem.exists`` through py4j at Dataset.py:50-56,
call sites listed in SURVEY.md §2.1 S4) and memoizes every query result
to Parquet (S3, e.g. Dataset.py:182). ``cached`` generalizes that into
one utility; ``write_parquet`` is the partition-aware sink (the
reference's writes are unpartitioned — fine for 7M rows, not at 100 TB).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, list[str]] | None = None,
) -> None:
    """Parquet sink. ``partition_by`` gives partition pruning on read;
    ``bucket_by`` (with saveAsTable) gives shuffle-free co-located joins."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by:
        n, cols = bucket_by
        # bucketBy requires a table sink (metastore-tracked layout)
        writer.bucketBy(n, *cols).sortBy(*cols).option("path", path).saveAsTable(
            path.rstrip("/").rsplit("/", 1)[-1]
        )
        return
    writer.parquet(path)


def path_exists(spark: SparkSession, path: str) -> bool:
    """Filesystem-agnostic existence probe through the Hadoop FS API —
    the same JVM call the reference makes (Dataset.py:50-56), but works
    for local, HDFS, and object-store URIs alike."""
    jvm = spark._jvm
    jsc = spark._jsc
    conf = jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf).exists(p)


def cached(
    spark: SparkSession,
    path: str,
    build: Callable[[], DataFrame],
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Cache-or-compute: return ``read.parquet(path)`` if it exists, else
    run ``build()``, persist to ``path``, and read it back.

    Replaces the reference's 12 copy-pasted probe blocks. Reading back
    (rather than returning the built plan) mirrors the reference's
    behavior and gives downstream queries a clean scan with pushdown.
    """
    if not path_exists(spark, path):
        write_parquet(build(), path, partition_by=partition_by)
    return spark.read.parquet(path)
