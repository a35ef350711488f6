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


def _quota_model(rows, n):
    """Independent pandas/python model of quota_sample's selection
    order: first n per group by (hash bucket, md5, key)."""
    import hashlib

    def h(k):
        return int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16)

    def md5(k):
        return hashlib.md5(str(k).encode()).hexdigest()

    by_group: dict = {}
    for g, k in rows:
        by_group.setdefault(g, []).append(k)
    keep = set()
    for g, ks in by_group.items():
        ks.sort(key=lambda k: (h(k) % 4096, md5(k), k))
        keep.update((g, k) for k in ks[:n])
    return keep


def test_quota_sample_exact_counts_and_model_agreement(spark):
    """quota_sample keeps exactly min(n, group_size) rows per group, and
    its membership equals the independent model of the documented
    (bucket, hash, key) selection order."""
    from big_data_chicago_crimes_spark.operators.sampling import quota_sample

    rows = [(f"g{ i % 3}", i) for i in range(500)] + [("tiny", 9999)]
    df = spark.createDataFrame(rows, "domain string, doc_id long")
    out = quota_sample(df, ["domain"], 40, "doc_id")
    got = {(r.domain, r.doc_id) for r in out.collect()}
    sizes = {}
    for d, _ in got:
        sizes[d] = sizes.get(d, 0) + 1
    assert sizes == {"g0": 40, "g1": 40, "g2": 40, "tiny": 1}
    assert got == _quota_model(rows, 40)


def test_quota_sample_deterministic_and_monotone(spark):
    """Membership survives repartitioning, and raising the quota only
    ADDS rows (prefix of a fixed content order — stable training sets
    while quotas are tuned)."""
    from big_data_chicago_crimes_spark.operators.sampling import quota_sample

    rows = [(f"d{i % 4}", i) for i in range(800)]
    df = spark.createDataFrame(rows, "domain string, doc_id long")
    a = {(r.domain, r.doc_id) for r in quota_sample(df, ["domain"], 25, "doc_id").collect()}
    b = {
        (r.domain, r.doc_id)
        for r in quota_sample(df.repartition(13), ["domain"], 25, "doc_id").collect()
    }
    assert a == b
    bigger = {
        (r.domain, r.doc_id) for r in quota_sample(df, ["domain"], 60, "doc_id").collect()
    }
    assert a < bigger  # strict superset: monotone growth
    assert len(bigger) == 4 * 60


def test_quota_sample_boundary_window_is_bucket_bounded(spark):
    """The exact-rank window must receive only the boundary bucket's
    rows, never the whole group: the plan's row_number window sits on a
    filtered input, and with a 1-row bucket histogram (buckets=1) the
    operator degrades gracefully to full ranking — same answer."""
    from big_data_chicago_crimes_spark.operators.sampling import quota_sample

    rows = [("d", i) for i in range(300)]
    df = spark.createDataFrame(rows, "domain string, doc_id long")
    fine = {(r.domain, r.doc_id) for r in quota_sample(df, ["domain"], 17, "doc_id").collect()}
    assert len(fine) == 17
    coarse = {
        (r.domain, r.doc_id)
        for r in quota_sample(df, ["domain"], 17, "doc_id", buckets=1).collect()
    }
    # bucket granularity changes the selection ORDER's first component
    # (all rows share bucket 0 at buckets=1), so membership may differ;
    # the quota contract (exact count, determinism) must hold regardless
    assert len(coarse) == 17


def _mix_kept(spark, rows, alpha, buckets=1000):
    from big_data_chicago_crimes_spark.operators.sampling import temperature_mix

    df = spark.createDataFrame(rows, "id long, domain string")
    out = temperature_mix(df, "domain", "id", alpha=alpha, buckets=buckets)
    return {r.id for r in out.collect()}


def test_temperature_mix_endpoints_and_model(spark):
    """alpha=1 keeps everything; alpha=0 cuts every domain to ~n_min;
    alpha=0.5 matches an independent python model of the thresholds."""
    import hashlib

    rows = [(i, "big" if i < 900 else "small") for i in range(1_000)]
    assert len(_mix_kept(spark, rows, alpha=1.0)) == 1_000

    kept0 = _mix_kept(spark, rows, alpha=0.0)
    big0 = sum(1 for i in kept0 if i < 900)
    # threshold = floor(1000 * (100/900)) = 111 buckets ⇒ ~100 rows of big
    assert sum(1 for i in kept0 if i >= 900) == 100  # smallest kept whole
    assert 60 < big0 < 160

    kept5 = _mix_kept(spark, rows, alpha=0.5)
    import math

    thr = {
        "big": math.floor(1000 * math.sqrt(100 / 900)),
        "small": math.floor(1000 * math.sqrt(100 / 100)),
    }
    model = {
        i
        for i, d in rows
        if int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 1000 < thr[d]
    }
    assert kept5 == model


def test_temperature_mix_membership_nested_across_alpha(spark):
    """Thresholds are monotone in alpha, so raising the temperature only
    ADDS rows — tuning never churns membership."""
    rows = [(i, f"d{i % 3}") for i in range(2_000)]
    k25 = _mix_kept(spark, rows, alpha=0.25)
    k50 = _mix_kept(spark, rows, alpha=0.5)
    k75 = _mix_kept(spark, rows, alpha=0.75)
    assert k25 <= k50 <= k75


def test_temperature_mix_rejects_bad_alpha(spark):
    df = spark.createDataFrame([(1, "a")], "id long, domain string")
    from big_data_chicago_crimes_spark.operators.sampling import temperature_mix

    with pytest.raises(ValueError):
        temperature_mix(df, "domain", "id", alpha=1.5)


def test_global_hash_order_matches_naive_model(spark):
    """The histogram-offset two-level rank must equal row_number() over
    the plain total order (stage, bucket, md5, key) — and be a complete
    1..n numbering."""
    import hashlib

    from big_data_chicago_crimes_spark.operators.sampling import global_hash_order

    rows = [(i, i % 3) for i in range(2_000)]
    df = spark.createDataFrame(rows, "id long, stage int")
    out = {
        r.id: r.global_rank
        for r in global_hash_order(df, "id", ["stage"], buckets=16).collect()
    }

    def sort_key(row):
        i, stage = row
        h = hashlib.md5(str(i).encode()).hexdigest()
        return (stage, int(h[:8], 16) % 16, h, i)

    model = {i: rk + 1 for rk, (i, _s) in enumerate(sorted(rows, key=sort_key))}
    assert out == model
    assert sorted(out.values()) == list(range(1, 2_001))


def test_global_hash_order_append_stable_within_earlier_stages(spark):
    """Adding rows to a LATER stage must not reorder earlier stages'
    rows relative to each other (their absolute ranks are unchanged)."""
    from big_data_chicago_crimes_spark.operators.sampling import global_hash_order

    base = [(i, 0) for i in range(500)]
    grown = base + [(i, 1) for i in range(500, 800)]
    df_b = spark.createDataFrame(base, "id long, stage int")
    df_g = spark.createDataFrame(grown, "id long, stage int")
    rb = {r.id: r.global_rank for r in global_hash_order(df_b, "id", ["stage"]).collect()}
    rg = {r.id: r.global_rank for r in global_hash_order(df_g, "id", ["stage"]).collect()}
    assert all(rg[i] == rb[i] for i in rb)  # stage-0 ranks untouched


def test_balanced_shards_balance_and_determinism(spark):
    """LPT-snake sharding: per-shard weight totals within one max row
    weight of each other on a mixed-weight corpus, every row assigned
    exactly one shard in [0, n), and the assignment is a pure function
    of content (stable under repartition)."""
    from pyspark.sql import functions as F

    from big_data_chicago_crimes_spark.operators.sampling import balanced_shards

    rows = [(i, (i * 37) % 100 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    out = balanced_shards(df, F.col("w"), 4, key="doc_id")
    per_shard = {
        r["shard"]: (r["n"], r["tot"])
        for r in out.groupBy("shard")
        .agg(F.count("*").alias("n"), F.sum("w").alias("tot"))
        .collect()
    }
    assert set(per_shard) == {0, 1, 2, 3}
    totals = [t for _, t in per_shard.values()]
    assert max(totals) - min(totals) <= 100  # one max row weight
    a = sorted((r["doc_id"], r["shard"]) for r in out.collect())
    b = sorted(
        (r["doc_id"], r["shard"])
        for r in balanced_shards(
            df.repartition(13), F.col("w"), 4, key="doc_id"
        ).collect()
    )
    assert a == b


def test_doremi_weights_hand_model_and_properties(spark):
    """doremi_weights matches an independent python model of the
    Littlestone-Warmuth update ((1+eta*excess)^steps, normalized,
    uniform-smoothed), weights sum to 1, zero excess everywhere gives
    the uniform mixture, and higher excess never gets a lower weight."""
    from big_data_chicago_crimes_spark.operators.sampling import doremi_weights

    losses = spark.createDataFrame(
        [("a", 2.5, 2.0), ("b", 2.0, 2.0), ("c", 2.25, 2.5)],
        "domain string, proxy_loss double, ref_loss double",
    )
    got = {
        r.domain: (r.excess_loss, r.weight)
        for r in doremi_weights(losses, eta=1.0, steps=3, smoothing=0.125).collect()
    }
    # python model, same op order
    lam = {"a": 0.5, "b": 0.0, "c": 0.0}  # c's excess clips at 0
    raw = {d: (1.0 + 1.0 * v) ** 3 for d, v in lam.items()}
    s = raw["a"] + raw["b"] + raw["c"]
    model = {d: 0.875 * (raw[d] / s) + 0.125 / 3 for d in raw}
    for d in model:
        assert got[d][0] == lam[d]
        assert abs(got[d][1] - model[d]) < 1e-12, d
    assert abs(sum(w for _, w in got.values()) - 1.0) < 1e-12
    assert got["a"][1] > got["b"][1] == got["c"][1]

    # all-zero excess -> uniform
    flat = spark.createDataFrame(
        [("a", 2.0, 2.0), ("b", 2.0, 2.5)],
        "domain string, proxy_loss double, ref_loss double",
    )
    w = {r.domain: r.weight for r in doremi_weights(flat).collect()}
    assert w["a"] == w["b"] == 0.5


def test_doremi_mix_no_upsampling_and_determinism(spark):
    """doremi_mix realizes the weights as the LARGEST sample that never
    upsamples: the binding domain (min n/w) keeps ~everything, every
    kept set is a subset of its domain, and membership is stable under
    repartition (hash-threshold contract)."""
    from big_data_chicago_crimes_spark.operators.sampling import (
        doremi_mix,
        doremi_weights,
    )

    rows = [(i, "hot" if i < 200 else "cold") for i in range(1_200)]
    df = spark.createDataFrame(rows, "id long, domain string")
    losses = spark.createDataFrame(
        [("hot", 3.0, 2.0), ("cold", 2.0, 2.0)],
        "domain string, proxy_loss double, ref_loss double",
    )
    kept = doremi_mix(df, losses, "domain", "id").collect()
    w = {r.domain: r.weight for r in doremi_weights(losses).collect()}
    # binding domain: hot has n=200 against the large weight -> its
    # threshold is the full bucket range (kept whole)
    t_max = min(200 / w["hot"], 1000 / w["cold"])
    assert t_max == 200 / w["hot"]
    hot_kept = sum(1 for r in kept if r.domain == "hot")
    cold_kept = sum(1 for r in kept if r.domain == "cold")
    assert hot_kept >= 195  # threshold 999/1000 leaves at most a sliver
    # cold is sampled down toward w_cold * t_max rows
    import math

    cold_thr = math.floor(1000 * (w["cold"] * t_max / 1000))
    assert 0 < cold_thr < 1000
    assert abs(cold_kept - cold_thr) < 60  # hash-uniformity tolerance

    again = {
        (r.id, r.domain)
        for r in doremi_mix(df.repartition(7), losses, "domain", "id").collect()
    }
    assert again == {(r.id, r.domain) for r in kept}


def test_stratified_exact_sample_counts_and_model_agreement(spark):
    """stratified_exact_sample keeps exactly floor(f_s * n_s) rows per
    stratum, and membership equals the independent naive-window model
    (rank by (bucket, md5, key) within stratum) — the same total order
    the DuckDB oracle replays."""
    import math

    from pyspark.sql import Window

    from big_data_chicago_crimes_spark.operators.sampling import (
        hash_bucket,
        stratified_exact_sample,
    )

    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(900)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    fr = {"en": 0.5, "de": 0.25}
    out = stratified_exact_sample(
        df, "lang", fr, key="doc_id", default_fraction=0.125
    )
    got = {(r.lang, r.doc_id) for r in out.collect()}
    sizes: dict[str, int] = {}
    for lang, _ in got:
        sizes[lang] = sizes.get(lang, 0) + 1
    n = {lang: 300 for lang in ("en", "de", "fr")}
    assert sizes == {
        lang: math.floor(fr.get(lang, 0.125) * n[lang]) for lang in n
    }

    frac = (
        F.when(F.col("lang") == "en", 0.5)
        .when(F.col("lang") == "de", 0.25)
        .otherwise(0.125)
    )
    w = Window.partitionBy("lang").orderBy(
        "__b", F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    naive = (
        df.withColumn("__b", hash_bucket(F.col("doc_id"), 4096))
        .withColumn("rk", F.row_number().over(w))
        .withColumn("n", F.count("*").over(Window.partitionBy("lang")))
        .filter(F.col("rk") <= F.floor(frac * F.col("n")))
    )
    assert got == {(r.lang, r.doc_id) for r in naive.collect()}


def test_stratified_exact_sample_deterministic_monotone_and_edges(spark):
    """Membership survives repartitioning; raising a stratum's fraction
    only ADDS rows; f=0 keeps nothing, f=1 keeps everything."""
    from big_data_chicago_crimes_spark.operators.sampling import (
        stratified_exact_sample,
    )

    rows = [(i, ["en", "de"][i % 2]) for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    a = {
        r.doc_id
        for r in stratified_exact_sample(df, "lang", {"en": 0.25}, "doc_id").collect()
    }
    b = {
        r.doc_id
        for r in stratified_exact_sample(
            df.repartition(11), "lang", {"en": 0.25}, "doc_id"
        ).collect()
    }
    assert a == b and len(a) == 75  # floor(0.25 * 300); de default 0 → dropped
    bigger = {
        r.doc_id
        for r in stratified_exact_sample(df, "lang", {"en": 0.5}, "doc_id").collect()
    }
    assert a < bigger and len(bigger) == 150
    everything = stratified_exact_sample(
        df, "lang", {"en": 1.0}, "doc_id", default_fraction=1.0
    )
    assert everything.count() == 600


def test_stratified_exact_sample_rejects_bad_fractions(spark):
    import pytest as _pytest

    from big_data_chicago_crimes_spark.operators.sampling import (
        stratified_exact_sample,
    )

    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with _pytest.raises(ValueError, match="not in \\[0, 1\\]"):
        stratified_exact_sample(df, "lang", {"en": 1.5}, "doc_id")
    with _pytest.raises(ValueError, match="default_fraction"):
        stratified_exact_sample(df, "lang", {}, "doc_id", default_fraction=-0.1)


def test_weighted_quota_sample_prefix_model_and_budget(spark):
    """weighted_quota_sample keeps the maximal content-hash-order prefix
    whose running weight fits the budget — membership equals the naive
    running-sum window model, kept weight never exceeds the budget, and
    the draw is repartition-stable and budget-monotone."""
    from pyspark.sql import Window

    from big_data_chicago_crimes_spark.operators.sampling import (
        hash_bucket,
        weighted_quota_sample,
    )

    rows = [(i, ["en", "de"][i % 2], (i * 7) % 13 + 1) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, w long")
    out = weighted_quota_sample(df, ["lang"], 300, "w", key="doc_id")
    got = {(r.lang, r.doc_id) for r in out.collect()}

    w = Window.partitionBy("lang").orderBy(
        "__b", F.md5(F.col("doc_id").cast("string")), "doc_id"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    naive = (
        df.withColumn("__b", hash_bucket(F.col("doc_id"), 4096))
        .withColumn("cw", F.sum("w").over(w))
        .filter(F.col("cw") <= 300)
    )
    assert got == {(r.lang, r.doc_id) for r in naive.collect()}
    for r in out.groupBy("lang").agg(F.sum("w").alias("tw")).collect():
        assert r.tw <= 300

    again = {
        (r.lang, r.doc_id)
        for r in weighted_quota_sample(
            df.repartition(17), ["lang"], 300, "w", "doc_id"
        ).collect()
    }
    assert again == got
    smaller = {
        (r.lang, r.doc_id)
        for r in weighted_quota_sample(df, ["lang"], 150, "w", "doc_id").collect()
    }
    assert smaller < got  # monotone in budget


def test_weighted_quota_sample_edges(spark):
    """budget=0 keeps nothing; a budget covering the whole group keeps
    everything; a first-in-order row heavier than the budget blocks its
    group (prefix semantics — rows are never split); negative budget
    raises."""
    import pytest as _pytest

    from big_data_chicago_crimes_spark.operators.sampling import (
        weighted_quota_sample,
    )

    df = spark.createDataFrame(
        [(1, "g", 5), (2, "g", 5), (3, "g", 5)], "doc_id long, lang string, w long"
    )
    assert weighted_quota_sample(df, ["lang"], 0, "w", "doc_id").count() == 0
    assert weighted_quota_sample(df, ["lang"], 100, "w", "doc_id").count() == 3
    # every row weighs 5 > budget 4: the prefix is empty regardless of order
    assert weighted_quota_sample(df, ["lang"], 4, "w", "doc_id").count() == 0
    with _pytest.raises(ValueError, match="non-negative"):
        weighted_quota_sample(df, ["lang"], -1, "w", "doc_id")


def test_hash_sample_rejects_degenerate_fractions(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "k long")
    with pytest.raises(ValueError, match="rounds to 0"):
        hash_sample(df, "k", fraction=0.004)
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        hash_sample(df, "k", fraction=1.5)
    assert hash_sample(df, "k", fraction=0.0).count() == 0  # exact 0 is honest


def test_hash_split_null_key_raises_instead_of_biasing_last_split(spark):
    df = spark.createDataFrame([(1,), (None,)], "k long")
    out = hash_split(df, "k", {"train": 0.8, "test": 0.2})
    with pytest.raises(Exception, match="NULL in key"):
        out.collect()


def test_hash_split_zero_fraction_gets_clear_error(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="rounds? to 0"):
        hash_split(df, "k", {"train": 1.0, "test": 0.0})


def test_quota_sample_rejects_negative_quota(spark):
    from big_data_chicago_crimes_spark.operators.sampling import quota_sample

    df = spark.createDataFrame([(1, "a")], "doc_id long, g string")
    with pytest.raises(ValueError, match="non-negative"):
        quota_sample(df, ["g"], n=-5, key="doc_id")


def test_stratified_hash_sample_validates_default_fraction(spark):
    from big_data_chicago_crimes_spark.operators.sampling import (
        stratified_hash_sample,
    )

    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with pytest.raises(ValueError, match="rounds to 0"):
        stratified_hash_sample(df, "doc_id", "lang", {"en": 0.5},
                               default_fraction=0.004)
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        stratified_hash_sample(df, "doc_id", "lang", {"en": 0.5},
                               default_fraction=1.5)


def test_temperature_mix_subresolution_domain_raises_not_drops(spark):
    """A domain whose keep-rate rounds below 1/buckets must raise, not
    silently delete the domain from the mixture."""
    from big_data_chicago_crimes_spark.operators.sampling import temperature_mix

    rows = [(i, "big") for i in range(20000)] + [(99999, "tiny")]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    # rate(big) = sqrt(1/20000) ~= 7.07e-3 -> floor(100 * rate) = 0
    out = temperature_mix(df, "domain", "doc_id", alpha=0.5, buckets=100)
    with pytest.raises(Exception, match="rounds to 0"):
        out.collect()
    # and the same config succeeds at sufficient bucket resolution
    ok = temperature_mix(df, "domain", "doc_id", alpha=0.5, buckets=100_000)
    assert ok.filter(F.col("domain") == "big").count() > 0


def test_score_ntile_nan_raises_instead_of_dropping_everything(spark):
    from big_data_chicago_crimes_spark.operators.sampling import score_ntile

    df = spark.createDataFrame(
        [(1, 0.5), (2, float("nan")), (3, 0.7)], "doc_id long, score double"
    )
    with pytest.raises(Exception, match="NULL/NaN"):
        score_ntile(df, "score", k=3, part_cols=[], key="doc_id").collect()


def test_global_hash_order_null_key_or_stage_raises(spark):
    from big_data_chicago_crimes_spark.operators.sampling import global_hash_order

    df = spark.createDataFrame([(1, "s"), (None, "s")], "k long, st string")
    with pytest.raises(Exception, match="NULL in key"):
        global_hash_order(df, "k", stage_cols=["st"]).collect()
    df2 = spark.createDataFrame([(1, "s"), (2, None)], "k long, st string")
    with pytest.raises(Exception, match="NULL in key"):
        global_hash_order(df2, "k", stage_cols=["st"]).collect()


def test_balanced_shards_banded_weights_still_balance(spark):
    """The high-cardinality scale path: eighth-power banding must keep
    relative shard imbalance in the documented low-single-digit-percent
    range on a uniform mix (the banding worst case — within-band order
    is hash-random) and stay deterministic."""
    from big_data_chicago_crimes_spark.operators.sampling import balanced_shards

    rows = [(i, float(17 + (i * 37) % 400) + i * 1e-6) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    out = balanced_shards(df, F.col("w"), n_shards=4, banded_weights=True)
    totals = {
        r["shard"]: r["tw"]
        for r in out.groupBy("shard").agg(F.sum("w").alias("tw")).collect()
    }
    assert len(totals) == 4
    mean = sum(totals.values()) / 4
    assert (max(totals.values()) - min(totals.values())) / mean < 0.10
    again = balanced_shards(df, F.col("w"), n_shards=4, banded_weights=True)
    assert out.collect() == again.collect()


def test_weighted_quota_rejects_null_and_negative_weights(spark):
    """r15 review sweep: the prefix semantics REQUIRE non-negative
    weights (a negative weight makes the cumsum non-monotone and
    silently corrupts the cutoff bucket, residual, and boundary
    prefix; a NULL vanishes from both sums). Both must raise at
    execution, not mis-sample."""
    import pytest as _pytest
    from pyspark.errors import PySparkRuntimeError
    from py4j.protocol import Py4JJavaError

    from big_data_chicago_crimes_spark.operators.sampling import (
        weighted_quota_sample,
    )

    neg = spark.createDataFrame(
        [(1, "en", 10), (2, "en", -3), (3, "en", 5)],
        "doc_id long, lang string, w long",
    )
    with _pytest.raises((PySparkRuntimeError, Py4JJavaError, Exception)) as e:
        weighted_quota_sample(neg, ["lang"], 100, "w", "doc_id").collect()
    assert "non-negative" in str(e.value)

    nul = spark.createDataFrame(
        [(1, "en", 10), (2, "en", None), (3, "en", 5)],
        "doc_id long, lang string, w long",
    )
    with _pytest.raises((PySparkRuntimeError, Py4JJavaError, Exception)) as e:
        weighted_quota_sample(nul, ["lang"], 100, "w", "doc_id").collect()
    assert "non-negative" in str(e.value)


def test_weighted_quota_guard_is_output_identical_on_valid_weights(spark):
    """The guard must not change any kept set on valid input — pinned
    against the pre-guard Python prefix model."""
    import hashlib

    from big_data_chicago_crimes_spark.operators.sampling import (
        weighted_quota_sample,
    )

    rows = [(i, "en" if i % 3 else "fr", (i * 37) % 50) for i in range(1, 61)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, w long")
    got = sorted(
        r.doc_id
        for r in weighted_quota_sample(df, ["lang"], 200, "w", "doc_id").collect()
    )

    def h(x):
        return hashlib.md5(str(x).encode()).hexdigest()

    expect = []
    for lang in ("en", "fr"):
        # the operator's order is (hash bucket, row hash, key) — the
        # bucket is int(md5[:8], 16) % 4096, NOT a prefix of the md5 order
        grp = sorted(
            (r for r in rows if r[1] == lang),
            key=lambda r: (int(h(r[0])[:8], 16) % 4096, h(r[0]), r[0]),
        )
        run = 0
        for did, _, w in grp:
            if run + w > 200:
                break
            run += w
            expect.append(did)
    assert got == sorted(expect)


def test_doremi_weights_rejects_sign_bugs(spark):
    import pytest as _pytest

    from big_data_chicago_crimes_spark.operators.sampling import doremi_weights

    losses = spark.createDataFrame(
        [("a", 2.0, 1.0)], "domain string, proxy_loss double, ref_loss double"
    )
    with _pytest.raises(ValueError, match="eta"):
        doremi_weights(losses, eta=-1.0)
    with _pytest.raises(ValueError, match="smoothing"):
        doremi_weights(losses, smoothing=1.5)


def test_weighted_priority_sample_matches_python_model(spark):
    """Membership equals the A-Res model computed independently in
    Python (md5 -> unit draw -> max-normalized ln(u)·wmax/w ranking),
    is deterministic under repartition, and the grouped form keeps
    exactly n per group."""
    import hashlib
    import math

    from big_data_chicago_crimes_spark.operators.sampling import (
        weighted_priority_sample,
    )

    rows = [
        (i, "en" if i % 2 else "fr", float(1 + (i * 7) % 13)) for i in range(1, 81)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, w double")
    wmax = max(w for _, _, w in rows)

    def upy(k):
        h = int(hashlib.md5(str(k).encode()).hexdigest()[:12], 16)
        return (h + 1) / float((1 << 48) + 1)

    def pri(k, w):
        return round(math.log(upy(k)) * wmax / w, 6)

    expect = sorted(
        ((pri(i, w), -i) for i, _, w in rows), reverse=True
    )[:10]
    expect_ids = sorted(-e[1] for e in expect)
    got = sorted(
        r.doc_id
        for r in weighted_priority_sample(df, "doc_id", "w", 10).collect()
    )
    assert got == expect_ids, (got, expect_ids)
    again = sorted(
        r.doc_id
        for r in weighted_priority_sample(
            df.repartition(7), "doc_id", "w", 10
        ).collect()
    )
    assert again == got

    grouped = weighted_priority_sample(df, "doc_id", "w", 5, group_cols=["lang"])
    per = {
        r.lang: r.cnt
        for r in grouped.groupBy("lang").count().withColumnRenamed("count", "cnt").collect()
    }
    assert per == {"en": 5, "fr": 5}
    # grouped membership also matches the model per group
    for lang in ("en", "fr"):
        exp = sorted(
            ((pri(i, w), -i) for i, lg, w in rows if lg == lang), reverse=True
        )[:5]
        exp_ids = sorted(-e[1] for e in exp)
        g = sorted(r.doc_id for r in grouped.filter(F.col("lang") == lang).collect())
        assert g == exp_ids, lang


def test_weighted_priority_sample_weight_bias_and_guards(spark):
    """Heavier rows must be overrepresented (the A-Res property), and
    non-positive/NULL weights raise rather than silently never-sample."""
    import pytest as _pytest

    from big_data_chicago_crimes_spark.operators.sampling import (
        weighted_priority_sample,
    )

    rows = [(i, 20.0 if i % 2 == 0 else 1.0) for i in range(1, 401)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    kept = [
        r.doc_id for r in weighted_priority_sample(df, "doc_id", "w", 100).collect()
    ]
    heavy = sum(1 for i in kept if i % 2 == 0)
    assert heavy > 70, heavy  # 20:1 weights -> heavy class dominates

    bad = spark.createDataFrame([(1, 0.0), (2, 3.0)], "doc_id long, w double")
    with _pytest.raises(Exception, match="positive"):
        weighted_priority_sample(bad, "doc_id", "w", 1).collect()
    nul = spark.createDataFrame([(1, None), (2, 3.0)], "doc_id long, w double")
    with _pytest.raises(Exception, match="positive"):
        weighted_priority_sample(nul, "doc_id", "w", 1).collect()

    clash = spark.createDataFrame([(1, 2.0, 0.5)], "doc_id long, w double, __priority double")
    with _pytest.raises(ValueError, match="reserved|already has"):
        weighted_priority_sample(clash, "doc_id", "w", 1)


def test_weighted_priority_sample_large_weights_keep_resolution(spark):
    """ADVICE r15: with raw ln(u)/w ranking, weights ≥ ~1e6 collapse
    every priority to -0.000000 at 6dp and selection degenerates to the
    key tie-break (ascending doc_id). Max-normalization must keep the
    weight-proportional draw: membership matches the normalized Python
    model, NOT the first-n-by-key degenerate set."""
    import hashlib
    import math

    from big_data_chicago_crimes_spark.operators.sampling import (
        weighted_priority_sample,
    )

    rows = [(i, float(1e6 + (i * 7919) % 1000000)) for i in range(1, 201)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    wmax = max(w for _, w in rows)

    def upy(k):
        h = int(hashlib.md5(str(k).encode()).hexdigest()[:12], 16)
        return (h + 1) / float((1 << 48) + 1)

    expect = sorted(
        ((round(math.log(upy(i)) * wmax / w, 6), -i) for i, w in rows),
        reverse=True,
    )[:20]
    expect_ids = sorted(-e[1] for e in expect)
    got = sorted(
        r.doc_id for r in weighted_priority_sample(df, "doc_id", "w", 20).collect()
    )
    assert got == expect_ids, (got, expect_ids)
    assert got != list(range(1, 21)), "degenerated to the key tie-break"


def test_hash_unit_rejects_inexact_hex_width(spark):
    """hash_unit decodes the hex prefix through a DOUBLE: 13 nibbles
    (52 bits) is the last exact width; 14+ must raise, not silently
    collide distinct hashes after the cast (ADVICE r15)."""
    import pytest as _pytest

    from big_data_chicago_crimes_spark.operators.sampling import hash_unit

    with _pytest.raises(ValueError, match="52 bits|hex_chars"):
        hash_unit("doc_id", hex_chars=14)
    with _pytest.raises(ValueError, match="hex_chars"):
        hash_unit("doc_id", hex_chars=0)
    # 13 is still exact and allowed
    hash_unit("doc_id", hex_chars=13)


def _tme_rows():
    """Skewed three-domain corpus: en 300, fr 60, de 12."""
    return (
        [(i, "en") for i in range(300)]
        + [(i, "fr") for i in range(300, 360)]
        + [(i, "de") for i in range(360, 372)]
    )


def test_temperature_mix_exact_counts_and_model_agreement(spark):
    """The exact-count temperature mix keeps floor(sqrt(n_min/n_g)·n_g)
    rows per domain (alpha=0.5 — replayed with the same correctly-
    rounded ops in Python), and the unweighted membership equals the
    module's content-hash prefix order (bucket, md5, key) — the
    quota_sample model with a per-domain k."""
    import hashlib
    import math

    from big_data_chicago_crimes_spark.operators.sampling import (
        temperature_mix_exact,
    )

    rows = _tme_rows()
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_mix_exact(df, "lang", "doc_id", alpha=0.5)
    n = {"en": 300, "fr": 60, "de": 12}
    nmin = 12
    exp_k = {d: math.floor(math.sqrt(nmin / nd) * nd) for d, nd in n.items()}
    got = {(r.lang, r.doc_id) for r in out.collect()}
    sizes: dict = {}
    for d, _ in got:
        sizes[d] = sizes.get(d, 0) + 1
    assert sizes == exp_k, (sizes, exp_k)

    def h(k):
        return int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16)

    def m(k):
        return hashlib.md5(str(k).encode()).hexdigest()

    expect = set()
    by_d: dict = {}
    for i, d in rows:
        by_d.setdefault(d, []).append(i)
    for d, ks in by_d.items():
        ks.sort(key=lambda k: (h(k) % 4096, m(k), k))
        expect.update((d, k) for k in ks[: exp_k[d]])
    assert got == expect
    # census columns ride along
    assert {"__mix_n_total", "__mix_k"} <= set(out.columns)
    # determinism under repartition
    again = {
        (r.lang, r.doc_id)
        for r in temperature_mix_exact(
            df.repartition(7), "lang", "doc_id", alpha=0.5
        ).collect()
    }
    assert again == got


def test_temperature_mix_exact_nested_and_endpoints(spark):
    """Raising alpha only ever ADDS rows (the selection order is fixed;
    only the per-domain cutoff count moves), alpha=1 keeps the corpus
    whole, and the smallest domain is always kept whole at alpha=0.5."""
    from big_data_chicago_crimes_spark.operators.sampling import (
        temperature_mix_exact,
    )

    df = spark.createDataFrame(_tme_rows(), "doc_id long, lang string")
    cold = {
        (r.lang, r.doc_id)
        for r in temperature_mix_exact(df, "lang", "doc_id", alpha=0.25).collect()
    }
    warm = {
        (r.lang, r.doc_id)
        for r in temperature_mix_exact(df, "lang", "doc_id", alpha=0.75).collect()
    }
    assert cold <= warm and len(cold) < len(warm)
    full = {
        (r.lang, r.doc_id)
        for r in temperature_mix_exact(df, "lang", "doc_id", alpha=1.0).collect()
    }
    assert full == {(d, i) for i, d in _tme_rows()}
    half = {
        (r.lang, r.doc_id)
        for r in temperature_mix_exact(df, "lang", "doc_id", alpha=0.5).collect()
    }
    assert {(d, i) for i, d in _tme_rows() if d == "de"} <= half


def test_temperature_mix_exact_weighted_matches_ares_model(spark):
    """The weighted path fills each domain's exact quota with the top
    A-Res priorities (max-normalized ln(u)·wmax/w, doc_id tie-break) —
    membership equals the independent Python model per domain."""
    import hashlib
    import math

    from big_data_chicago_crimes_spark.operators.sampling import (
        temperature_mix_exact,
    )

    rows = [
        (i, "en" if i < 300 else ("fr" if i < 360 else "de"), float(1 + (i * 7) % 13))
        for i in range(372)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, w double")
    out = temperature_mix_exact(df, "lang", "doc_id", alpha=0.5, weight_col="w")
    n = {"en": 300, "fr": 60, "de": 12}
    exp_k = {d: math.floor(math.sqrt(12 / nd) * nd) for d, nd in n.items()}
    wmax = max(w for _, _, w in rows)

    def pri(k, w):
        h = int(hashlib.md5(str(k).encode()).hexdigest()[:12], 16)
        u = (h + 1) / float((1 << 48) + 1)
        return round(math.log(u) * wmax / w, 6)

    expect = set()
    for d in n:
        dom = sorted(
            ((pri(i, w), -i) for i, lg, w in rows if lg == d), reverse=True
        )[: exp_k[d]]
        expect.update((d, -e[1]) for e in dom)
    got = {(r.lang, r.doc_id) for r in out.collect()}
    assert got == expect
    # weighted membership differs from the unweighted prefix draw
    unw = {
        (r.lang, r.doc_id)
        for r in temperature_mix_exact(
            df.select("doc_id", "lang"), "lang", "doc_id", alpha=0.5
        ).collect()
    }
    assert got != unw


def test_temperature_mix_exact_guards(spark):
    """Bad alpha and reserved-column collisions raise at build; a
    non-positive weight raises at execution (the A-Res guard)."""
    import pytest as _pytest

    from big_data_chicago_crimes_spark.operators.sampling import (
        temperature_mix_exact,
    )

    df = spark.createDataFrame(
        [(1, "en", 1.0), (2, "fr", 0.0)], "doc_id long, lang string, w double"
    )
    with _pytest.raises(ValueError, match="alpha"):
        temperature_mix_exact(df, "lang", "doc_id", alpha=1.5)
    clash = df.withColumn("__mix_k", F.lit(1))
    with _pytest.raises(ValueError, match="__mix_k"):
        temperature_mix_exact(clash, "lang", "doc_id")
    with _pytest.raises(Exception, match="positive weights"):
        temperature_mix_exact(
            df, "lang", "doc_id", weight_col="w"
        ).collect()


def test_epoch_upsample_matches_python_model(spark):
    """Copy counts equal the independent model (floor(r) + stochastic-
    rounding extra via the md5 unit draw), integer rates are exact
    (identity at 1.0, exactly-two at 2.0 — no boundary-luck rows),
    epoch indexes are 1..n, membership is repartition-stable, and
    raising a domain's rate only ever ADDS copies."""
    import hashlib

    from big_data_chicago_crimes_spark.operators.sampling import epoch_upsample

    rows = [(i, ["web", "wiki", "code"][i % 3]) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")

    def unit(k):
        h = int(hashlib.md5(str(k).encode()).hexdigest()[:12], 16)
        return (h + 1) / float((1 << 48) + 1)

    def model(rates):
        out = {}
        for i, d in rows:
            r = rates[d]
            n = int(r) + (1 if unit(i) <= r - int(r) else 0)
            if n >= 1:
                out[(d, i)] = n
        return out

    rates = {"web": 0.5, "wiki": 2.3, "code": 1.0}
    rdf = spark.createDataFrame(list(rates.items()), "domain string, rate double")
    got_rows = epoch_upsample(df, rdf, "domain", "doc_id").collect()
    got = {}
    epochs = {}
    for r in got_rows:
        got[(r.domain, r.doc_id)] = got.get((r.domain, r.doc_id), 0) + 1
        epochs.setdefault((r.domain, r.doc_id), []).append(r.epoch)
    assert got == model(rates)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in epochs.values())
    # integer rates exact: every code row exactly once, every wiki row >= 2
    assert all(n == 1 for (d, _), n in got.items() if d == "code")
    assert all(n >= 2 for (d, _), n in got.items() if d == "wiki")
    # repartition determinism
    again = {}
    for r in epoch_upsample(df.repartition(7), rdf, "domain", "doc_id").collect():
        again[(r.domain, r.doc_id)] = again.get((r.domain, r.doc_id), 0) + 1
    assert again == got
    # monotone in rate: raising wiki 2.3 -> 2.7 only adds copies
    rdf2 = spark.createDataFrame(
        [("web", 0.5), ("wiki", 2.7), ("code", 1.0)], "domain string, rate double"
    )
    more = {}
    for r in epoch_upsample(df, rdf2, "domain", "doc_id").collect():
        more[(r.domain, r.doc_id)] = more.get((r.domain, r.doc_id), 0) + 1
    assert all(more.get(k, 0) >= n for k, n in got.items())


def test_epoch_upsample_guards(spark):
    """Negative/NULL rates and NULL keys raise; reserved-column
    collisions raise at build; absent domains drop via the inner join
    (the explicit-recipe contract)."""
    import pytest as _pytest

    from big_data_chicago_crimes_spark.operators.sampling import epoch_upsample

    df = spark.createDataFrame(
        [(1, "web"), (2, "niche")], "doc_id long, domain string"
    )
    bad = spark.createDataFrame([("web", -1.0)], "domain string, rate double")
    with _pytest.raises(Exception, match="must be >= 0"):
        epoch_upsample(df, bad, "domain", "doc_id").collect()
    ok = spark.createDataFrame([("web", 1.0)], "domain string, rate double")
    out = epoch_upsample(df, ok, "domain", "doc_id").collect()
    assert [(r.doc_id, r.epoch) for r in out] == [(1, 1)]  # niche dropped
    clash = df.withColumn("epoch", F.lit(1))
    with _pytest.raises(ValueError, match="epoch"):
        epoch_upsample(clash, ok, "domain", "doc_id")
    nullkey = spark.createDataFrame(
        [(None, "web")], "doc_id long, domain string"
    )
    with _pytest.raises(Exception, match="NULL 'doc_id'"):
        # fractional rate so the draw is evaluated
        half = spark.createDataFrame([("web", 0.5)], "domain string, rate double")
        epoch_upsample(nullkey, half, "domain", "doc_id").collect()
    # fat-fingered rate (225 for 2.25) raises loudly instead of
    # exploding every row 225x (ADVICE r16, range_join max_replication
    # convention); an explicit cap raise admits it
    fat = spark.createDataFrame([("web", 225.0)], "domain string, rate double")
    with _pytest.raises(Exception, match="max_rate"):
        epoch_upsample(df, fat, "domain", "doc_id").collect()
    allowed = epoch_upsample(df, fat, "domain", "doc_id", max_rate=300.0).collect()
    assert len(allowed) == 225


def test_epoch_upsample_rejects_duplicate_rate_rows(spark):
    """Two rate rows for one domain would silently multiply every
    row's copy count through the join — the guard raises instead."""
    import pytest as _pytest

    from big_data_chicago_crimes_spark.operators.sampling import epoch_upsample

    df = spark.createDataFrame([(1, "web")], "doc_id long, domain string")
    dup = spark.createDataFrame(
        [("web", 1.0), ("web", 2.0)], "domain string, rate double"
    )
    with _pytest.raises(Exception, match="duplicate rate rows"):
        epoch_upsample(df, dup, "domain", "doc_id").collect()
