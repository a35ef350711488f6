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


def test_late_only_microbatch_does_not_regress_last_ts(spark, tmp_path):
    """A micro-batch consisting only of LATE events must not pull the
    emitted last-seen timestamp backwards — the running max rides the
    state (as epoch micros), not just the current batch."""
    import pandas as pd

    from big_data_chicago_crimes_spark.streaming.stateful import (
        _update_user_profile,
    )

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    st = FakeState()
    b1 = pd.DataFrame({"ts": [pd.Timestamp("2024-01-01 12:00:00")], "value": [1.0]})
    out1 = list(_update_user_profile((1,), iter([b1]), st))[0]
    b2 = pd.DataFrame({"ts": [pd.Timestamp("2024-01-01 11:00:00")], "value": [2.0]})
    out2 = list(_update_user_profile((1,), iter([b2]), st))[0]
    assert out1["last_ts"].iloc[0] == pd.Timestamp("2024-01-01 12:00:00")
    assert out2["last_ts"].iloc[0] == pd.Timestamp("2024-01-01 12:00:00")
    assert out2["n_events"].iloc[0] == 2


def test_all_nat_microbatch_does_not_poison_last_ts(spark):
    """r16 sweep: a micro-batch whose ts are ALL NaT (e.g. null event
    times from an at-least-once source) must leave last-seen unknown /
    unchanged — assigning NaT would store NaT.value (-2^63 us) in the
    state tuple and the NEXT batch's pd.Timestamp(unit='us')
    reconstruction raises OutOfBoundsDatetime, killing the stream long
    after the bad batch. Counters must still fold."""
    import pandas as pd

    from big_data_chicago_crimes_spark.streaming.stateful import (
        _update_user_profile,
    )

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    st = FakeState()
    # batch 1: only NaT timestamps -> last seen stays unknown (None)
    b1 = pd.DataFrame({"ts": pd.to_datetime([None, None]), "value": [1.0, 2.0]})
    out1 = list(_update_user_profile((1,), iter([b1]), st))[0]
    assert out1["n_events"].iloc[0] == 2
    assert pd.isna(out1["last_ts"].iloc[0])
    assert st._v[2] is None  # stored micros stay None, not NaT.value
    # batch 2: a real timestamp resumes the running max cleanly
    b2 = pd.DataFrame({"ts": [pd.Timestamp("2024-01-01 12:00:00")], "value": [3.0]})
    out2 = list(_update_user_profile((1,), iter([b2]), st))[0]
    assert out2["last_ts"].iloc[0] == pd.Timestamp("2024-01-01 12:00:00")
    assert out2["n_events"].iloc[0] == 3
    # batch 3: NaT again AFTER a real max -> max must not regress or NaT-ify
    b3 = pd.DataFrame({"ts": pd.to_datetime([None]), "value": [4.0]})
    out3 = list(_update_user_profile((1,), iter([b3]), st))[0]
    assert out3["last_ts"].iloc[0] == pd.Timestamp("2024-01-01 12:00:00")
