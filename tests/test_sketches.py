"""Count-min sketch operator tests: the one-sided error guarantee,
boundedness of the sketch state, exactness in the collision-free
regime, and the cell-wise mergeability the 100 TB story rests on."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_chicago_crimes_spark.operators.sketches import cms_build, cms_estimate


def _items(spark, tokens):
    return spark.createDataFrame([(t,) for t in tokens], "token string")


def test_cms_never_undercounts_under_heavy_collisions(spark):
    """width=4 over 20 distinct tokens forces collisions; every
    estimate must still be >= the true count (the CMS guarantee)."""
    toks = [f"tok{i % 20}" for i in range(200)] + ["rare"]
    df = _items(spark, toks)
    exact = df.groupBy("token").agg(F.count(F.lit(1)).alias("exact"))
    est = cms_estimate(cms_build(df, "token", depth=3, width=4), exact,
                       "token", depth=3, width=4)
    bad = est.filter(F.col("cms_cnt") < F.col("exact")).count()
    assert bad == 0


def test_cms_exact_when_wide(spark):
    """A sketch much wider than the vocabulary has no collisions (for
    this deterministic token set) — estimates equal exact counts."""
    toks = ["a"] * 5 + ["b"] * 3 + ["c"] * 2 + ["d"]
    df = _items(spark, toks)
    exact = df.groupBy("token").agg(F.count(F.lit(1)).alias("exact"))
    est = cms_estimate(cms_build(df, "token", depth=4, width=4096), exact,
                       "token", depth=4, width=4096)
    rows = est.collect()
    assert all(r["cms_cnt"] == r["exact"] for r in rows)


def test_cms_state_is_bounded_by_depth_times_width(spark):
    df = _items(spark, [f"t{i}" for i in range(500)])
    sketch = cms_build(df, "token", depth=4, width=8)
    assert sketch.count() <= 4 * 8
    # every instance lands in exactly one bucket per row
    per_row = sketch.groupBy("row").agg(F.sum("c").alias("n")).collect()
    assert {r["n"] for r in per_row} == {500}


def test_cms_merges_cell_wise_across_splits(spark):
    """sketch(full) == cell-wise sum of sketch(split1) + sketch(split2):
    the property that lets per-partition sketches combine — the groupBy
    in cms_build IS this merge."""
    a = _items(spark, [f"x{i % 7}" for i in range(50)])
    b = _items(spark, [f"x{i % 5}" for i in range(30)])
    full = cms_build(a.unionByName(b), "token", depth=3, width=8)
    merged = (
        cms_build(a, "token", depth=3, width=8)
        .unionByName(cms_build(b, "token", depth=3, width=8))
        .groupBy("row", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    diff = full.join(merged, ["row", "bucket"], "full").filter(
        (F.coalesce(full["c"], F.lit(0)) != F.coalesce(merged["c"], F.lit(0)))
    )
    assert diff.count() == 0


def test_cms_unseen_item_estimates_zero_when_buckets_untouched(spark):
    """A probe for an item whose buckets were never written coalesces
    to 0 — the degenerate-miss contract (a sketch built on SOME data
    can still answer 'never seen' for colliding-free probes)."""
    df = _items(spark, ["only"])
    sketch = cms_build(df, "token", depth=4, width=4096)
    probe = _items(spark, ["definitely-absent-token"])
    out = cms_estimate(sketch, probe, "token", depth=4, width=4096).collect()
    assert out[0]["cms_cnt"] == 0


def test_cms_estimate_survives_items_column_named_c(spark):
    """The broadcast sketch's internal columns must not collide with
    caller columns named row/bucket/c."""
    df = _items(spark, ["a", "a", "b"])
    sketch = cms_build(df, "token", depth=2, width=8)
    items = df.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    out = {
        r["token"]: (r["c"], r["cms_cnt"])
        for r in cms_estimate(sketch, items, "token", depth=2, width=8).collect()
    }
    assert out["a"] == (2, 2) and out["b"] == (1, 1)


def test_cms_estimate_reserved_output_name_raises(spark):
    import pytest

    df = _items(spark, ["a"])
    sketch = cms_build(df, "token", depth=2, width=8)
    items = df.withColumn("cms_cnt", F.lit(0))
    with pytest.raises(ValueError, match="collide"):
        cms_estimate(sketch, items, "token", depth=2, width=8)


# --- HyperLogLog ---------------------------------------------------------

from big_data_chicago_crimes_spark.operators.sketches import (  # noqa: E402
    HLL_P,
    hll_build,
    hll_estimate,
    hll_merge,
)

_M = 1 << HLL_P


def test_hll_state_bounded_and_duplicate_insensitive(spark):
    """Sketch state is ≤ m rows per group regardless of cardinality, and
    duplicate instances change NOTHING (distinct-count semantics: an
    item's hash always routes to the same register with the same rank)."""
    df = _items(spark, [f"t{i}" for i in range(3000)])
    sk = hll_build(df, "token", [])
    assert sk.count() <= _M
    dup = _items(spark, [f"t{i % 3000}" for i in range(9000)])
    sk_dup = hll_build(dup, "token", [])
    a = {(r["idx"], r["m_rho"]) for r in sk.collect()}
    b = {(r["idx"], r["m_rho"]) for r in sk_dup.collect()}
    assert a == b


def test_hll_merge_of_splits_equals_direct_sketch(spark):
    """max is associative: merging sketches over disjoint splits must
    equal the sketch built directly on the union — the property that
    lets per-day sketch tables be stored and re-aggregated."""
    a = _items(spark, [f"x{i}" for i in range(400)])
    b = _items(spark, [f"x{i}" for i in range(200, 700)])  # overlapping too
    direct = hll_build(a.unionByName(b), "token", [])
    merged = hll_merge(
        hll_build(a, "token", []), hll_build(b, "token", []), []
    )
    got_d = {(r["idx"], r["m_rho"]) for r in direct.collect()}
    got_m = {(r["idx"], r["m_rho"]) for r in merged.collect()}
    assert got_d == got_m


def test_hll_estimate_within_advertised_error(spark):
    """~1.04/√m relative error at p=10 (≈3.2%); allow 3σ on a
    deterministic fixture at two cardinalities spanning the linear-
    counting and raw-estimator branches."""
    for n in (100, 5000):
        df = _items(spark, [f"item-{i}" for i in range(n)])
        row = hll_estimate(hll_build(df, "token", []), []).collect()[0]
        rel = abs(row["hll_est"] - n) / n
        assert rel < 3 * 1.04 / (_M ** 0.5), (n, row["hll_est"])


# --- Histogram quantile sketch -------------------------------------------

from big_data_chicago_crimes_spark.operators.sketches import (  # noqa: E402
    qsketch_build,
    qsketch_merge,
    qsketch_quantile,
)


def _vals(spark, xs):
    return spark.createDataFrame([("g", float(x)) for x in xs], "g string, v double")


def test_qsketch_state_bounded_and_outliers_clip_to_edge_bins(spark):
    df = _vals(spark, list(range(-100, 10_100)))  # outliers both sides of [0, 10000)
    sk = qsketch_build(df, "v", ["g"], lo=0.0, hi=10_000.0, n_bins=64)
    rows = sk.collect()
    assert len(rows) <= 64
    bins = {r["bin"] for r in rows}
    assert bins <= set(range(64))
    total = sum(r["c"] for r in rows)
    assert total == 10_200  # clipped, never dropped


def test_qsketch_merge_of_splits_equals_direct(spark):
    a = _vals(spark, range(0, 600))
    b = _vals(spark, range(400, 1000))
    direct = qsketch_build(a.unionByName(b), "v", ["g"], 0.0, 1000.0, 32)
    merged = qsketch_merge(
        qsketch_build(a, "v", ["g"], 0.0, 1000.0, 32),
        qsketch_build(b, "v", ["g"], 0.0, 1000.0, 32),
        ["g"],
    )
    got_d = {(r["bin"], r["c"]) for r in direct.collect()}
    got_m = {(r["bin"], r["c"]) for r in merged.collect()}
    assert got_d == got_m


def test_qsketch_quantile_within_one_bin_width(spark):
    import random

    rng = random.Random(7)
    xs = [rng.uniform(0, 1000) for _ in range(5000)]
    df = _vals(spark, xs)
    n_bins = 128
    width = 1000.0 / n_bins
    sk = qsketch_build(df, "v", ["g"], 0.0, 1000.0, n_bins)
    row = qsketch_quantile(sk, [0.5, 0.9], ["g"], 0.0, 1000.0, n_bins).collect()[0]
    xs_sorted = sorted(xs)
    for q, col in [(0.5, "q_0_5"), (0.9, "q_0_9")]:
        import math

        true_q = xs_sorted[max(math.ceil(q * len(xs)) - 1, 0)]
        assert abs(row[col] - true_q) <= width, (q, row[col], true_q)


def test_qsketch_nulls_dropped_and_bad_range_raises(spark):
    import pytest

    df = spark.createDataFrame(
        [("g", 1.0), ("g", None), ("g", 2.0)], "g string, v double"
    )
    sk = qsketch_build(df, "v", ["g"], 0.0, 10.0, 8)
    assert sum(r["c"] for r in sk.collect()) == 2
    with pytest.raises(ValueError, match="hi > lo"):
        qsketch_build(df, "v", ["g"], 5.0, 5.0, 8)


def test_hll_null_items_carry_no_identity(spark):
    """md5(NULL) must not route a phantom register: NULL items are
    dropped (COUNT(DISTINCT) semantics), so a stream with NULLs builds
    the SAME sketch as the stream without them."""
    with_nulls = spark.createDataFrame(
        [("a",), (None,), ("b",), (None,)], "token string"
    )
    without = _items(spark, ["a", "b"])
    got = {(r["idx"], r["m_rho"]) for r in hll_build(with_nulls, "token", []).collect()}
    want = {(r["idx"], r["m_rho"]) for r in hll_build(without, "token", []).collect()}
    assert got == want and len(want) == 2


def test_hll_sketch_table_parquet_roundtrip_and_cross_day_merge(spark, tmp_path):
    """The 100 TB operational story, run for real: build a per-day
    sketch TABLE, write it to parquet, read it back later, merge with a
    new day's sketch, estimate — all without re-reading day 1's data.
    The roundtripped merge must equal the sketch built directly over
    both days' union (registers are integers; parquet roundtrips them
    exactly)."""
    day1 = _items(spark, [f"u{i}" for i in range(300)])
    day2 = _items(spark, [f"u{i}" for i in range(200, 600)])
    path = str(tmp_path / "hll_day1")
    hll_build(day1, "token", []).write.parquet(path)

    stored = spark.read.parquet(path)
    merged = hll_estimate(hll_merge(stored, hll_build(day2, "token", []), []), [])
    direct = hll_estimate(hll_build(day1.unionByName(day2), "token", []), [])
    m, d = merged.collect()[0], direct.collect()[0]
    assert (m["n_regs"], m["z_int"], m["hll_est"]) == (
        d["n_regs"], d["z_int"], d["hll_est"]
    )


def test_cms_estimate_items_distinct_flag_is_output_identical(spark):
    """items_distinct=True skips the defensive dedup exchange (ADVICE
    r14); the output contract must be unchanged — on an ALREADY-distinct
    probe both forms agree, and on a non-distinct probe the final
    groupBy still collapses duplicates to the same rows."""
    from big_data_chicago_crimes_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    df = spark.createDataFrame(
        [(t,) for t in ["a", "a", "a", "b", "b", "c"]], "token string"
    )
    sketch = cms_build(df, "token", depth=3, width=64)
    distinct_probe = df.select("token").distinct()
    dup_probe = df.select("token")  # carries duplicates

    def rows(est):
        return sorted((r.token, r.cms_cnt) for r in est.collect())

    base = rows(cms_estimate(sketch, distinct_probe, "token", depth=3, width=64))
    assert base == rows(
        cms_estimate(
            sketch, distinct_probe, "token", depth=3, width=64, items_distinct=True
        )
    )
    assert base == rows(
        cms_estimate(sketch, dup_probe, "token", depth=3, width=64)
    )


def test_cms_build_drops_null_items(spark):
    """NULL items must not accumulate phantom NULL-bucket state rows
    (the hll_build contract; r15 sweep)."""
    from big_data_chicago_crimes_spark.operators.sketches import cms_build

    df = spark.createDataFrame(
        [("a",), (None,), ("a",), (None,)], "token string"
    )
    sk = cms_build(df, "token", depth=3, width=8).collect()
    assert all(r.bucket is not None for r in sk)
    assert sum(r.c for r in sk) == 2 * 3  # two non-null instances x depth


def test_qsketch_build_raises_on_nan(spark):
    """A NaN value would silently clamp into the TOP bin (Spark orders
    NaN above every number) and corrupt the high quantiles — raise
    instead (the score_ntile convention)."""
    import pytest as _pytest

    from big_data_chicago_crimes_spark.operators.sketches import qsketch_build

    df = spark.createDataFrame(
        [(1.0,), (float("nan"),), (2.0,)], "v double"
    )
    with _pytest.raises(Exception, match="NaN"):
        qsketch_build(df, "v", [], lo=0.0, hi=10.0, n_bins=16).collect()


def test_qsketch_quantile_rejects_out_of_range_q(spark):
    import pytest as _pytest

    from big_data_chicago_crimes_spark.operators.sketches import (
        qsketch_build,
        qsketch_quantile,
    )

    df = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    sk = qsketch_build(df, "v", [], lo=0.0, hi=10.0, n_bins=16)
    with _pytest.raises(ValueError, match="outside"):
        qsketch_quantile(sk, [0.5, 1.5], [], lo=0.0, hi=10.0, n_bins=16)


def test_hll_overlap_estimate_inclusion_exclusion(spark):
    """Overlap via inclusion-exclusion on stored sketches: a planted
    50%-overlap pair estimates within the sketch error budget, disjoint
    sets clamp at 0, and a group present in one side only reports
    overlap 0 with the other's estimate 0."""
    from big_data_chicago_crimes_spark.operators.sketches import (
        hll_build,
        hll_overlap_estimate,
    )

    # group g: A = 0..999, B = 500..1499 -> true overlap 500
    # group d: A = tokens 0..299, B = 10_000..10_299 -> overlap 0
    # group only_a: A only
    rows_a = (
        [("g", f"u{i}") for i in range(1000)]
        + [("d", f"u{i}") for i in range(300)]
        + [("only_a", f"u{i}") for i in range(100)]
    )
    rows_b = [("g", f"u{i}") for i in range(500, 1500)] + [
        ("d", f"u{i}") for i in range(10_000, 10_300)
    ]
    a = hll_build(
        spark.createDataFrame(rows_a, "grp string, item string"), "item", ["grp"]
    )
    b = hll_build(
        spark.createDataFrame(rows_b, "grp string, item string"), "item", ["grp"]
    )
    got = {
        r.grp: (r.est_a, r.est_b, r.est_union, r.overlap_est)
        for r in hll_overlap_estimate(a, b, ["grp"]).collect()
    }
    ea, eb, eu, ov = got["g"]
    # each estimate has ~3.2% stddev at p=10; allow a generous band on
    # the difference-of-three (true union 1500, true overlap 500)
    assert abs(ea - 1000) < 150 and abs(eb - 1000) < 150
    assert abs(eu - 1500) < 200
    assert 250 < ov < 750, got["g"]
    assert got["d"][3] < 120, got["d"]  # near-0 overlap (clamped at 0 floor)
    assert got["only_a"][1] == 0.0 and got["only_a"][3] == 0.0


def test_cms_inner_product_estimates_join_size(spark):
    """a·b = sum_x fa(x)*fb(x) is the equi-join output size; the CMS
    estimate is min-of-per-row bucket dot products. Never undercounts;
    exact when the sketch is wide enough that no buckets collide."""
    from big_data_chicago_crimes_spark.operators.sketches import cms_inner_product

    a_rows = [("u1",)] * 3 + [("u2",)] * 2 + [("u3",)] * 1
    b_rows = [("u1",)] * 4 + [("u2",)] * 5 + [("u4",)] * 7
    exact = 3 * 4 + 2 * 5  # u3/u4 unmatched
    a = spark.createDataFrame(a_rows, "k string")
    b = spark.createDataFrame(b_rows, "k string")

    wide = cms_inner_product(
        cms_build(a, "k", depth=4, width=4096),
        cms_build(b, "k", depth=4, width=4096),
    ).collect()[0][0]
    assert wide == exact

    narrow = cms_inner_product(
        cms_build(a, "k", depth=4, width=2), cms_build(b, "k", depth=4, width=2)
    ).collect()[0][0]
    assert narrow >= exact  # collisions only ADD non-negative cross-terms


def test_cms_inner_product_disjoint_and_empty(spark):
    """A sketch row with zero bucket overlap must contribute dot 0 to
    the min (disjoint key sets estimate 0) — an inner-join-then-min
    would silently skip it. Empty input estimates 0, not empty frame."""
    from big_data_chicago_crimes_spark.operators.sketches import cms_inner_product

    a = spark.createDataFrame([("x1",), ("x2",)], "k string")
    b = spark.createDataFrame([("y1",), ("y2",)], "k string")
    est = cms_inner_product(
        cms_build(a, "k", depth=4, width=4096),
        cms_build(b, "k", depth=4, width=4096),
    ).collect()[0][0]
    assert est == 0

    empty = spark.createDataFrame([], "k string")
    est0 = cms_inner_product(
        cms_build(empty, "k", depth=4, width=16),
        cms_build(b, "k", depth=4, width=16),
    ).collect()[0][0]
    assert est0 == 0


def test_cms_build_weighted_equals_instance_built(spark):
    """weight_col builds from pre-aggregated (item, count) rows; the
    sketch must be bit-identical to the instance-built one (the
    events_join_size_cms scale idiom: one corpus pass feeds counts AND
    sketch)."""
    rows = [("u1",)] * 3 + [("u2",)] * 2 + [("u3",)] * 1
    inst = spark.createDataFrame(rows, "k string")
    counts = spark.createDataFrame(
        [("u1", 3), ("u2", 2), ("u3", 1)], "k string, c long"
    )
    a = sorted(cms_build(inst, "k", depth=4, width=16).collect())
    b = sorted(
        cms_build(counts, "k", depth=4, width=16, weight_col="c").collect()
    )
    assert a == b


def test_cms_inner_product_geometry_validation(spark):
    """Declared-geometry check (ADVICE r16): probing a wide sketch
    against a declared narrower width fails loudly instead of joining
    bucket ids into a plausible-looking but meaningless estimate. The
    check is one-sided by design: matching geometry passes."""
    import pytest

    from big_data_chicago_crimes_spark.operators.sketches import cms_inner_product

    a = spark.createDataFrame([(f"u{i}",) for i in range(64)], "k string")
    wide = cms_build(a, "k", depth=4, width=256)
    ok = cms_build(a, "k", depth=4, width=16)

    with pytest.raises(ValueError, match="geometry mismatch"):
        cms_inner_product(wide, ok, depth=4, width=16)
    with pytest.raises(ValueError, match="geometry mismatch"):
        cms_inner_product(ok, wide, depth=4, width=16)
    est = cms_inner_product(ok, ok, depth=4, width=16).collect()[0][0]
    assert est >= 64  # self inner product >= F2 lower bound (n distinct, c=1 → >= n)


def test_cms_validate_geometry_batched(spark):
    """cms_validate_geometry (r17): one job validates several sketches,
    names the offending side, skips empty sketches and the no-geometry
    case, and cms_inner_product(validate=False) bypasses its per-call
    re-check (the pre-validated caller pattern)."""
    import pytest

    from big_data_chicago_crimes_spark.operators.sketches import (
        cms_inner_product,
        cms_validate_geometry,
    )

    a = spark.createDataFrame([(f"u{i}",) for i in range(64)], "k string")
    wide = cms_build(a, "k", depth=4, width=256)
    ok = cms_build(a, "k", depth=4, width=16)
    empty = cms_build(a.filter("k = 'nope'"), "k", depth=4, width=16)

    cms_validate_geometry({"ok": ok, "empty": empty}, depth=4, width=16)
    cms_validate_geometry({"wide": wide}, depth=None, width=None)  # no-op
    with pytest.raises(ValueError, match="bad_side.*geometry mismatch"):
        cms_validate_geometry({"ok": ok, "bad_side": wide}, depth=4, width=16)
    # validate=False bypasses the per-call check (caller pre-validated)
    est = cms_inner_product(wide, ok, depth=4, width=16, validate=False)
    assert est.collect()[0][0] >= 0
