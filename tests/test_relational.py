"""Operator-level tests for as-of join and salted join: exact semantics
on constructed fixtures and equivalence with the unsalted plan."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from big_data_chicago_crimes_spark.operators.asof import asof_join
from big_data_chicago_crimes_spark.operators.skew import salted_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "L1"),  # matches R@09:30
            (1, _ts("2024-01-01T09:00:00"), "L2"),  # matches R@09:00 (equal ts → ≤)
            (1, _ts("2024-01-01T08:00:00"), "L3"),  # no earlier right row
            (2, _ts("2024-01-01T12:00:00"), "L4"),  # other key
        ],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:00:00"), 100.0),
            (1, _ts("2024-01-01T09:30:00"), 200.0),
            (2, _ts("2024-01-01T11:00:00"), 300.0),
        ],
        "k int, rts timestamp, price double",
    )
    out = {
        r.tag: (r.rts_asof, r.price_asof)
        for r in asof_join(left, right, "k", "ts", "rts", ["price"]).collect()
    }
    assert out["L1"] == (_ts("2024-01-01T09:30:00"), 200.0)
    assert out["L2"] == (_ts("2024-01-01T09:00:00"), 100.0)  # ≤, not <
    assert "L3" not in out  # inner: unmatched dropped
    assert out["L4"] == (_ts("2024-01-01T11:00:00"), 300.0)

    # left variant keeps the unmatched row with nulls
    left_out = asof_join(left, right, "k", "ts", "rts", ["price"], how="left")
    l3 = [r for r in left_out.collect() if r.tag == "L3"][0]
    assert l3.rts_asof is None and l3.price_asof is None


def test_salted_join_equals_plain_join(spark):
    # skewed fact: 90% of rows on one key
    fact = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(1)).otherwise(F.col("id") % 10).cast("int").alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(10)], "k int, name string")
    plain = fact.join(dim, "k").groupBy("k", "name").agg(F.sum("v").alias("s"))
    salted = salted_join(fact, dim, "k").groupBy("k", "name").agg(F.sum("v").alias("s"))
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_rejects_dim_preserving_how(spark):
    """right/full outer joins would emit one null-extended row per salt
    replica for every unmatched dim row — salted_join must refuse them."""
    import pytest

    fact = spark.createDataFrame([(1, 10)], "k int, v int")
    dim = spark.createDataFrame([(1, "a"), (2, "b")], "k int, name string")
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="fact-side-preserving"):
            salted_join(fact, dim, "k", how=how)
    # fact-preserving variants still work and match the plain join
    for how in ("left", "left_semi", "left_anti"):
        plain = sorted(map(tuple, fact.join(dim, "k", how).collect()))
        salted = sorted(map(tuple, salted_join(fact, dim, "k", how=how).collect()))
        assert plain == salted, how


def test_range_join_matches_naive(spark):
    points = spark.range(200).selectExpr("id AS pid", "CAST(id * 7 % 100 AS DOUBLE) AS x")
    intervals = spark.createDataFrame(
        [(0, 0.0, 25.0), (1, 20.0, 60.0), (2, 55.0, 100.0)],
        "iid int, lo double, hi double",
    )
    from big_data_chicago_crimes_spark.operators.asof import range_join

    fast = range_join(points, intervals, "x", "lo", "hi", bucket_width=10.0)
    naive = points.join(
        intervals, (F.col("x") >= F.col("lo")) & (F.col("x") < F.col("hi"))
    )
    key = lambda r: (r.pid, r.iid)
    assert sorted(map(key, fast.collect())) == sorted(map(key, naive.collect()))


def test_asof_join_null_right_ts_never_fills(spark):
    """A right row with NULL ts satisfies 'largest ts <= left_ts' for NO
    left row; before the r14 fix it sorted FIRST in the as-of window and
    forward-filled its value onto every left row preceding the first
    real right row."""
    from datetime import datetime

    from big_data_chicago_crimes_spark.operators.asof import asof_join

    dt = lambda s: datetime(2024, 1, s)
    left = spark.createDataFrame([(1, dt(2)), (1, dt(12))], "k int, lts timestamp")
    right = spark.createDataFrame(
        [(1, None, 99.0), (1, dt(10), 5.0)], "k int, rts timestamp, v double"
    )
    out = {
        r["lts"].day: (r["v_asof"], r["rts_asof"])
        for r in asof_join(left, right, "k", "lts", "rts", ["v"], how="left").collect()
    }
    assert out[2] == (None, None)  # nothing at-or-before Jan 2
    assert out[12][0] == 5.0  # Jan 10 row, never the NULL-ts 99.0
    inner = asof_join(left, right, "k", "lts", "rts", ["v"], how="inner").collect()
    assert [r["lts"].day for r in inner] == [12]


def test_range_join_reversed_interval_matches_nothing_without_explosion(spark):
    """end <= start intervals match no point under [start, end); they
    must be dropped BEFORE bucket explosion (F.sequence silently
    generates a DESCENDING range for start > stop)."""
    from big_data_chicago_crimes_spark.operators.asof import range_join

    points = spark.createDataFrame([(5.0,), (50.0,)], "p double")
    intervals = spark.createDataFrame(
        [(0.0, 10.0, "ok"), (100.0, 0.0, "reversed"), (None, 10.0, "nullstart")],
        "s double, e double, tag string",
    )
    got = {
        (r["p"], r["tag"])
        for r in range_join(points, intervals, "p", "s", "e", 10.0).collect()
    }
    assert got == {(5.0, "ok")}


def test_asof_join_rejects_reserved_left_columns(spark):
    """A left column named __side/__ets or matching an *_asof output
    would merge through unionByName into the forward-fill chain (left
    values masquerading as right fills) — must raise, not corrupt."""
    import pytest

    from big_data_chicago_crimes_spark.operators.asof import asof_join

    right = spark.createDataFrame([(1, 1.0, 2.0)], "k int, rts double, v double")
    for bad in ("__side", "__ets", "v_asof"):
        left = spark.createDataFrame([(1, 5.0, 0.0)], f"k int, lts double, {bad} double")
        with pytest.raises(ValueError, match="asof_join.*reserved"):
            asof_join(left, right, "k", "lts", "rts", ["v"])


def test_range_join_raises_on_unbounded_replication(spark):
    """One interval spanning len/width >> typical (sentinel end-date,
    corrupt bound) must raise loudly with the span size in the message,
    not silently explode into millions of bucket replicas."""
    import pytest

    from big_data_chicago_crimes_spark.operators.asof import range_join

    points = spark.createDataFrame([(5.0,)], "p double")
    intervals = spark.createDataFrame(
        [(0.0, 10.0), (0.0, 500.0)], "s double, e double"
    )
    with pytest.raises(Exception, match="max_replication"):
        range_join(points, intervals, "p", "s", "e", 1.0, max_replication=100).collect()
    # under the cap the same data works and the guard costs nothing
    ok = range_join(points, intervals, "p", "s", "e", 1.0, max_replication=10_000)
    assert ok.count() == 2


def test_salted_and_topk_reject_reserved_columns(spark):
    import pytest

    from big_data_chicago_crimes_spark.operators.skew import salted_join
    from big_data_chicago_crimes_spark.operators.windows import top_k_per_group

    fact = spark.createDataFrame([(1, 0)], "k int, __salt int")
    dim = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="salted_join.*__salt"):
        salted_join(fact, dim, "k")
    with pytest.raises(ValueError, match="salted_join.*__salt"):
        salted_join(dim, fact, "k")
    df = spark.createDataFrame([(1, 2, 3)], "g int, v int, __rn int")
    with pytest.raises(ValueError, match="top_k_per_group.*__rn"):
        top_k_per_group(df, ["g"], [F.col("v").desc()], 1)


def test_asof_join_fills_matched_row_atomically_not_per_column(spark):
    """Per-column last(ignorenulls) fills mixed columns from DIFFERENT
    right rows whenever a carried value was NULL: with right rows
    (ts=3, a=NULL, b=9) and (ts=5, a=1, b=NULL), a left row at ts=6
    used to fill (a=1, b=9) — two rows' values where the as-of match is
    ONE row. The struct fill returns (a=1, b=NULL) from ts=5 (r16 sweep)."""
    from big_data_chicago_crimes_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 6.0)], "k int, lts double")
    right = spark.createDataFrame(
        [(1, 3.0, None, 9.0), (1, 5.0, 1.0, None)],
        "k int, rts double, a double, b double",
    )
    row = asof_join(left, right, "k", "lts", "rts", ["a", "b"], how="left").collect()[0]
    assert row["rts_asof"] == 5.0
    assert row["a_asof"] == 1.0
    assert row["b_asof"] is None  # NOT 9.0 from the ts=3 row


def test_asof_join_equal_ts_right_rows_resolve_deterministically(spark):
    """Two right rows at the same (key, ts) used to fill in partition
    order — retry/repartition-unstable. The content-hash tie-break picks
    one deterministically, invariant under input partitioning."""
    from big_data_chicago_crimes_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10.0)], "k int, lts double")
    rows = [(1, 5.0, 100.0), (1, 5.0, 200.0), (1, 5.0, 300.0)]
    got = set()
    for nparts in (1, 2, 3):
        right = spark.createDataFrame(rows, "k int, rts double, v double").repartition(
            nparts
        )
        got.add(
            asof_join(left, right, "k", "lts", "rts", ["v"]).collect()[0]["v_asof"]
        )
    rev = spark.createDataFrame(rows[::-1], "k int, rts double, v double")
    got.add(asof_join(left, rev, "k", "lts", "rts", ["v"]).collect()[0]["v_asof"])
    assert len(got) == 1, f"fill varied with partitioning/order: {got}"


def test_asof_join_map_typed_carried_column_falls_back(spark):
    """A map-typed carried column is not orderable — the struct
    tie-break would fail at analysis (ADVICE r16). asof_join must drop
    the struct from the window ordering (generality over the
    duplicate-(key, ts) determinism guarantee) and still match/fill
    correctly and atomically."""
    from big_data_chicago_crimes_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 6.0), (1, 2.0)], "k int, lts double")
    right = spark.createDataFrame(
        [(1, 3.0, {"a": 1}, 9.0), (1, 5.0, {"b": 2}, None)],
        "k int, rts double, m map<string,int>, v double",
    )
    rows = {
        r["lts"]: r
        for r in asof_join(
            left, right, "k", "lts", "rts", ["m", "v"], how="left"
        ).collect()
    }
    assert rows[6.0]["rts_asof"] == 5.0
    assert rows[6.0]["m_asof"] == {"b": 2}
    assert rows[6.0]["v_asof"] is None  # atomic: NOT 9.0 from ts=3
    assert rows[2.0]["rts_asof"] is None  # unmatched left row surfaces
