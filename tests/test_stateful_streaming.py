"""Stateful streaming: the applyInPandasWithState per-user profile must
converge to the same totals a batch aggregation computes."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_chicago_crimes_spark.sources.readers import load_table
from big_data_chicago_crimes_spark.streaming.stateful import user_profile_stream
from big_data_chicago_crimes_spark.streaming.windows import read_events_stream


def test_stateful_profile_matches_batch(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    q = (
        user_profile_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("user_profiles_test")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # 'update' mode appends a row per refresh; the LAST row per user is
    # the converged profile
    final = (
        spark.table("user_profiles_test")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_value").alias("total_value"),
        )
    )
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    got = {r.user_id: (r.n_events, r.total_value) for r in final.collect()}
    want = {r.user_id: (r.n_events, r.total_value) for r in batch.collect()}
    assert set(got) == set(want)
    for uid, (n, tv) in want.items():
        assert got[uid][0] == n
        assert abs(got[uid][1] - tv) < 0.05  # per-batch rounding drift
