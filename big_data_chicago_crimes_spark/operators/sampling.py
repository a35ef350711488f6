"""Deterministic hash-based sampling and splitting (training-data
pipeline surface).

``df.sample()`` draws from a seeded RNG whose stream depends on
partitioning — results change under repartition/retry and can't be
reproduced by another engine. Dataset curation at 100 TB wants the
opposite: membership decided per ROW by a content hash, so the same row
lands in the same sample/split everywhere, every run, at every scale,
and adding rows never reshuffles existing assignments (the property that
keeps train/test splits stable as a corpus grows).

The hash is the first 8 hex digits of md5(key) — cheap, uniform, and
reproducible bit-for-bit in any engine with md5 (these operators' DuckDB
oracles prove it), at the price of ~2× xxhash64's cost; sampling is
scan-side and the hash never shuffles, so the trade buys cross-engine
verifiability for noise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column | str, buckets: int = 100) -> Column:
    """Uniform bucket in [0, buckets) from a stable content hash of
    ``key`` (md5 hex → int — engine-portable, partitioning-independent)."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(buckets)).cast("int")


def hash_unit(key: Column | str, hex_chars: int = 12) -> Column:
    """Deterministic uniform draw in (0, 1]: the first ``hex_chars`` hex
    digits of md5(key) as a 4·hex_chars-bit integer, mapped to
    ``(h + 1) / (2^bits + 1)`` — never 0 (safe as a log/power argument),
    engine-portable bit-for-bit (the HLL 48-bit routing convention), and
    a pure function of row content like every draw in this module.

    ``hex_chars`` is capped at 13: the hex prefix is decoded through a
    DOUBLE, whose 53-bit mantissa holds 4·13 = 52-bit integers exactly;
    one more nibble and distinct hashes silently collide after the cast
    (ADVICE r15), which breaks both uniformity and the bit-for-bit
    DuckDB replay."""
    if hex_chars < 1 or 4 * hex_chars > 52:
        raise ValueError(
            f"hash_unit: hex_chars must be in [1, 13] (got {hex_chars}) — "
            "the hex prefix is decoded via DOUBLE, exact only to 52 bits"
        )
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, hex_chars), 16, 10).cast(
        "double"
    )
    denom = float((1 << (4 * hex_chars)) + 1)
    return (h + F.lit(1.0)) / F.lit(denom)


def weighted_priority_sample(
    df: DataFrame,
    key: str,
    weight_col: str,
    n: int,
    group_cols: list[str] | None = None,
    priority_col: str = "__priority",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, derandomized — the
    A-Res scheme of Efraimidis & Spirakis 2006 ("Weighted random
    sampling with a reservoir") with the random draw replaced by the
    module's content hash: each row gets ``u = hash_unit(key)`` and
    priority ``ln(u) / w``; the ``n`` LARGEST priorities per group are
    the sample. Inclusion probability is proportional-to-weight in the
    A-Res sense, yet membership is a pure function of row content:
    stable under repartition, retry, and engine change — the property
    ``df.sample()``/rand() cannot give — and replayable in SQL (the
    DuckDB oracle computes the identical md5 → unit → ln ranking).
    This is the importance-sampling member of the family: quality- or
    loss-weighted corpus draws where ``weighted_quota_sample`` is a
    budget CAP (deterministic prefix, not probability-proportional)
    and ``hash_sample`` is unweighted.

    Ranking contract: priorities are ROUNDED to 6dp with a ``key``
    tie-break (the module-wide cross-engine convention — ln is not
    required correctly-rounded by IEEE-754, so ranking raw values
    would let a last-ulp divergence flip membership). Before rounding,
    weights are NORMALIZED by the frame's max weight — priority =
    ln(u) · max(w)/w — which preserves the A-Res order exactly
    (multiplying every priority by the positive constant max(w)) while
    pinning the heaviest rows' priorities at ln(u) ∈ O(1) magnitude:
    without it, raw ln(u)/w collapses to −0.000000 at 6dp once w ≳ 1e6
    and selection among heavy rows silently degenerates to the key
    tie-break (ADVICE r15). The max is one scalar aggregate
    broadcast-crossed back (the resize_media scalar-broadcast shape),
    and the oracle replays it as a CROSS JOIN (SELECT MAX(w) ...).
    Weights must be POSITIVE: NULL/negative raise at execution (the
    weighted-quota guard); a zero weight raises too — A-Res gives it
    priority −∞, i.e. 'never sampled', and a silent never-sampled row
    is the same trap as a silent empty split (filter zero-weight rows
    first if that is intended).

    Scale shape: one scalar-aggregate pass for max(w), then one scan
    computing (u, priority) in codegen, then top-n per group via
    orderBy+limit (global: TakeOrderedAndProject, per-partition heaps)
    or a rank window partitioned by group — never a global sort of the
    data. Returns the sampled rows with ``priority_col`` attached
    (callers may drop it)."""
    if n < 0:
        raise ValueError(f"n must be non-negative, got {n}")
    reserved = {priority_col, "__wps_max", "__wps_rk"}
    clash = sorted(reserved & set(df.columns))
    if clash:
        raise ValueError(
            f"weighted_priority_sample: input already has column(s) {clash} — "
            "rename them or pass a different priority_col"
        )
    w = F.col(weight_col)
    guarded = F.when(
        w.isNull() | (w <= 0),
        F.raise_error(
            F.lit(
                f"weighted_priority_sample: NULL/zero/negative {weight_col!r} — "
                "A-Res needs positive weights; filter or impute first"
            )
        ).cast("double"),
    ).otherwise(w.cast("double"))
    wmax = df.agg(F.max(guarded).alias("__wps_max"))
    pri = F.round(F.log(hash_unit(key)) * F.col("__wps_max") / guarded, 6)
    scored = (
        df.crossJoin(F.broadcast(wmax))
        .withColumn(priority_col, pri)
        .drop("__wps_max")
    )
    if not group_cols:
        return scored.orderBy(
            F.col(priority_col).desc(), F.col(key).asc()
        ).limit(n)
    from pyspark.sql import Window

    wnd = Window.partitionBy(*group_cols).orderBy(
        F.col(priority_col).desc(), F.col(key).asc()
    )
    return (
        scored.withColumn("__wps_rk", F.row_number().over(wnd))
        .filter(F.col("__wps_rk") <= n)
        .drop("__wps_rk")
    )


def hash_sample(
    df: DataFrame, key: str, fraction: float, buckets: int = 100
) -> DataFrame:
    """Keep rows whose hash bucket falls below ``fraction`` of the bucket
    space: a deterministic ~fraction sample, stable under repartition,
    retry, engine change, and corpus growth. Pure scan-side filter —
    no shuffle, pushdown-friendly. Degenerate rounding raises (the
    hash_split convention): a positive fraction that rounds to 0 of
    ``buckets`` would silently return an empty sample.

    NULL keys: a NULL hashes to NULL, every bucket comparison is NULL
    (false), so NULL-key rows are excluded from the sample at EVERY
    fraction — including 1.0. Subsetting operators document this (the
    temperature_mix contract) rather than raise — dropping is a
    sampler's normal outcome, unlike ``hash_split``'s row-preserving
    assignment where a NULL raises."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    keep = int(round(fraction * buckets))
    if fraction > 0.0 and keep < 1:
        raise ValueError(
            f"fraction {fraction} rounds to 0 of {buckets} buckets — raise "
            "`buckets` for fractions this small"
        )
    return df.filter(hash_bucket(key, buckets) < keep)


def hash_split(
    df: DataFrame,
    key: str,
    splits: dict[str, float],
    split_col: str = "split",
    buckets: int = 100,
) -> DataFrame:
    """Assign every row to a named split (train/val/test …) by hash
    bucket range. ``splits`` maps name → fraction; fractions must sum to
    1. Assignment is per-row-deterministic: growing the corpus never
    moves an existing row between splits.

    Degenerate configurations raise instead of silently mis-assigning:
    every split must round to ≥1 bucket (0.004 of 100 buckets would be an
    EMPTY split), and the rounded boundaries must cover the bucket space
    exactly (otherwise leftover buckets would silently fall into
    whichever split the ``otherwise`` names). Use more ``buckets`` for
    finer fractions."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    widths = {name: int(round(frac * buckets)) for name, frac in splits.items()}
    empty = [name for name, w in widths.items() if w < 1]
    if empty:
        positive = [v for v in splits.values() if v > 0]
        hint = f" (e.g. {max(1, int(1 / min(positive)))}+)" if positive else ""
        raise ValueError(
            f"splits {empty} round to 0 of {buckets} buckets — raise "
            f"`buckets`{hint} for fractions this small"
        )
    if sum(widths.values()) != buckets:
        raise ValueError(
            f"rounded split widths {widths} cover {sum(widths.values())} of "
            f"{buckets} buckets — choose fractions that partition the bucket "
            "space exactly (or raise `buckets`)"
        )
    bucket = hash_bucket(key, buckets)
    expr = None
    lo = 0
    for name, width in widths.items():
        hi = lo + width
        cond = (bucket >= lo) & (bucket < hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo = hi
    # widths proved to cover [0, buckets) exactly, so for NON-NULL keys
    # the otherwise branch is unreachable; a NULL key makes every range
    # condition NULL (treated as false) and would previously fall into
    # the LAST split silently, biasing it — raise loudly instead
    return df.withColumn(
        split_col,
        expr.otherwise(
            F.raise_error(
                F.lit(
                    f"hash_split: NULL in key column {key!r} — split "
                    "assignment needs a non-null key; filter or impute first"
                )
            ).cast("string")
        ),
    )


def _bounded_group_head(
    df: DataFrame,
    group_cols: list[str],
    key: str,
    buckets: int,
    cache_cutoffs: bool,
    with_quota,
    weight_col: str | None = None,
) -> DataFrame:
    """Shared engine of ``quota_sample``, ``stratified_exact_sample``,
    and ``weighted_quota_sample``: keep the maximal prefix of each group
    in (hash bucket, row hash, key) lexicographic order whose MASS stays
    within the group's quota ``__k``, where ``with_quota`` maps the
    per-(group, bucket) histogram frame to itself plus the ``__k``
    column (constant within each group — a literal for the fixed-count
    cap, ``floor(fraction × group total)`` for the exact stratified
    draw, a weight budget for the token-budget cap). Mass is row count
    when ``weight_col`` is None, else the sum of that column (per-row
    non-negative weights).

    The histogram-cutoff plan (see ``quota_sample``'s docstring for the
    full rationale) bounds the exact-rank window to the single boundary
    bucket — ~1/``buckets`` of the hottest group — instead of funnelling
    every row of a group through one WindowExec task. A group whose
    quota is 0 has no bucket with ``__before < __k`` and is dropped by
    the inner cutoff join, which is the correct degenerate keep-nothing.

    The weighted path guards every row's weight at execution (r15
    review sweep): the prefix semantics REQUIRE non-negative weights
    (the docstrings promised it, nothing enforced it) — a negative
    weight makes the histogram cumsum non-monotone, so the cutoff
    bucket, the residual, AND the boundary prefix all silently corrupt;
    a NULL weight vanishes from both sums, silently treating the row as
    weightless. Both raise loudly instead (the hash_split NULL-key
    convention)."""
    b = hash_bucket(F.col(key), buckets).alias("__qb")
    keyed = df.withColumn("__qb", b)
    if weight_col is not None:
        # the raise branch casts to the weight's OWN dtype so the when()
        # coercion can't change the sum arithmetic vs the unguarded form
        wtype = df.schema[weight_col].dataType.simpleString()
        guarded_w = F.when(
            F.col(weight_col).isNull() | (F.col(weight_col) < 0),
            F.raise_error(
                F.lit(
                    f"weighted quota: NULL or negative {weight_col!r} — "
                    "weights must be non-negative; filter or impute first"
                )
            ).cast(wtype),
        ).otherwise(F.col(weight_col))
        keyed = keyed.withColumn("__qw", guarded_w)
    mass = F.count(F.lit(1)) if weight_col is None else F.sum(F.col("__qw"))
    hist = keyed.groupBy(*group_cols, "__qb").agg(mass.alias("__cnt"))
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy("__qb")
    cuts = (
        with_quota(hist)
        .withColumn("__cum", F.sum("__cnt").over(w))
        .withColumn("__before", F.col("__cum") - F.col("__cnt"))
        # cutoff bucket = first bucket whose running sum reaches the quota
        .filter(F.col("__before") < F.col("__k"))
        .groupBy(*group_cols)
        .agg(
            F.max("__qb").alias("__cut"),
            # residual quota inside the cutoff bucket (__k is constant
            # within the group; __before is maximal at the cutoff bucket)
            (F.max("__k") - F.max("__before")).alias("__resid"),
        )
    )
    # Both output legs (below-cutoff keep-all; boundary exact-rank) join
    # against `cuts`. Without caching, Spark plans the histogram subtree
    # TWICE — two extra scans of the fact table for a groups-sized frame.
    # Persisting collapses that to one histogram pass shared via
    # InMemoryRelation (verified in the physical plan); the entry is
    # registered with the session scratch-cache so loop callers
    # (bench.py) release it after each materialization instead of
    # accumulating entries until LRU eviction (see ``cache_cutoffs``).
    if cache_cutoffs:
        from big_data_chicago_crimes_spark.session import scratch_persist

        cuts = scratch_persist(cuts)
    joined = keyed.join(cuts, group_cols, "inner")
    below = joined.filter(F.col("__qb") < F.col("__cut"))
    # boundary bucket: exact rank by (row hash, key) — a total order.
    # Count mass fills by row_number; weighted mass fills by the running
    # weight sum in the same order (weights ≥ 0 ⇒ the running sum is
    # monotone, so "≤ residual" selects a PREFIX — once the budget is
    # exceeded it stays exceeded).
    order_h = F.md5(F.col(key).cast("string"))
    wb = Window.partitionBy(*group_cols).orderBy(order_h, F.col(key))
    if weight_col is None:
        fill = F.row_number().over(wb)
    else:
        fill = F.sum(F.col("__qw")).over(
            wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    boundary = (
        joined.filter(F.col("__qb") == F.col("__cut"))
        .withColumn("__rk", fill)
        .filter(F.col("__rk") <= F.col("__resid"))
        .drop("__rk")
    )
    out = below.unionByName(boundary).drop("__qb", "__cut", "__resid")
    return out.drop("__qw") if weight_col is not None else out


def quota_sample(
    df: DataFrame,
    group_cols: list[str],
    n: int,
    key: str,
    buckets: int = 4096,
    cache_cutoffs: bool = True,
) -> DataFrame:
    """Keep AT MOST ``n`` rows per group — the per-domain quota cap of a
    data-mixing recipe ("no single domain may contribute more than N
    documents"), the COUNT-bound complement to
    ``stratified_hash_sample``'s rate-bound rebalancing.

    Selection is the first ``n`` rows of each group in (hash bucket,
    row hash, key) order — a pure function of row content, so it is
    deterministic under repartition/retry/engine change, unbiased (hash
    order is content-random), and MONOTONE: raising the quota only adds
    rows, it never swaps a previously kept row for another (stable
    training sets as quotas are tuned).

    Scale shape — the naive formulation (row_number() per group ordered
    by hash, keep rank ≤ n) funnels every row of a group through ONE
    WindowExec partition: a billion-row domain becomes a single straggler
    task. This implementation bounds the window input instead:

    1. histogram: count rows per (group, hash bucket) — one shuffle of a
       SMALL aggregate (groups × ≤``buckets`` rows), map-side partials;
    2. per-group cutoff bucket from the histogram's running sum (window
       over the histogram, not the data);
    3. rows in buckets BELOW the cutoff are kept outright (no sort
       anywhere); only the single boundary bucket — expected group_size /
       ``buckets`` rows — is exactly ranked to fill the residual quota.

    The exact-rank window therefore sees ~1/``buckets`` of the hottest
    group regardless of its size; raise ``buckets`` for hotter domains.
    ``key`` must be row-unique (like every operator in this module) —
    duplicate keys would make the boundary rank order non-total — and
    ``group_cols`` values must be NON-NULL: the cutoff join is plain
    equality, so a NULL group would be silently dropped rather than
    capped. ``cache_cutoffs=False`` skips persisting the groups-sized
    cutoff frame entirely (one extra histogram pass, zero cache
    footprint). The default True path registers the entry with the
    session scratch-cache; loop callers (bench.py) release it per build
    via ``session.release_scratch_caches()`` — prefer that lifecycle
    over False wherever the single-histogram plan matters.
    """
    if n < 0:
        # mirror weighted_quota_sample's budget guard: a negative quota
        # (a sign bug upstream) would silently empty every group through
        # the cutoff join instead of erroring
        raise ValueError(f"quota must be non-negative, got {n}")
    return _bounded_group_head(
        df,
        group_cols,
        key,
        buckets,
        cache_cutoffs,
        with_quota=lambda hist: hist.withColumn("__k", F.lit(n)),
    )


def stratified_hash_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    buckets: int = 100,
) -> DataFrame:
    """Deterministic per-stratum sampling: each stratum keeps its own
    hash-bucket fraction of rows (rebalancing a skewed corpus — e.g.
    down-sample the dominant language while keeping all of a rare one —
    is the standard curation move this expresses). Strata absent from
    ``fractions`` keep ``default_fraction``. Same reproducibility
    contract as hash_sample: membership is a pure function of the row
    key, so it survives repartition, retries, engine swaps, and corpus
    growth — and because the bucket hash ignores the stratum, CHANGING a
    stratum's fraction only adds or removes rows, never swaps one kept
    row for another (sample membership is nested across fractions).
    Scan-side filter; no shuffle."""
    for name, frac in {**fractions, "<default>": default_fraction}.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for stratum {name!r} not in [0, 1]: {frac}")
        if 0.0 < frac and int(round(frac * buckets)) < 1:
            raise ValueError(
                f"stratum {name!r} fraction {frac} rounds to 0 of {buckets} "
                "buckets — raise `buckets` for fractions this small"
            )
    bucket = hash_bucket(key, buckets)
    cut = None
    for name, frac in fractions.items():
        keep = F.lit(int(round(frac * buckets)))
        cond = F.col(strata_col) == name
        cut = F.when(cond, keep) if cut is None else cut.when(cond, keep)
    default_keep = F.lit(int(round(default_fraction * buckets)))
    cut = default_keep if cut is None else cut.otherwise(default_keep)
    return df.filter(bucket < cut)


def stratified_exact_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key: str,
    default_fraction: float = 0.0,
    buckets: int = 4096,
    cache_cutoffs: bool = True,
) -> DataFrame:
    """EXACT stratified draw: stratum ``s`` keeps exactly
    ``floor(f_s × n_s)`` rows (``n_s`` = stratum size), selected in
    (hash bucket, row hash, key) content-hash order — the count-exact
    member of the sampling family. ``stratified_hash_sample`` is
    rate-bound but bucket-granular (a stratum's kept count wanders by
    up to its per-bucket mass); Spark's own ``DataFrame.sampleBy`` is
    per-row Bernoulli (the kept COUNT is a random variable, and the
    draw changes under repartition/retry); ``quota_sample`` is exact
    but count-bound (a fixed cap, blind to stratum size). A rebalancing
    recipe stated as "keep exactly half of the English corpus and a
    tenth of everything else" is this operator.

    Determinism contract (same as ``quota_sample``): membership is a
    pure function of row content, stable under repartition, retry,
    engine change — the DuckDB oracle replays it as a plain
    ``row_number`` window — and MONOTONE per stratum: raising ``f_s``
    only adds rows. Strata absent from ``fractions`` keep
    ``default_fraction``.

    Scale shape: the per-stratum total comes from the SAME (stratum,
    bucket) histogram the cutoff derivation already builds (a window
    sum over the groups × ≤``buckets`` frame — never a second scan of
    the data), then the histogram-cutoff plan ranks only the single
    boundary bucket, so no stratum ever funnels through one WindowExec
    task. ``strata_col`` values must be NON-NULL and ``key`` row-unique
    (the ``quota_sample`` contract). ``floor(f × n)`` is an IEEE-754
    double product in both engines — identical, hence portable."""
    for name, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for stratum {name!r} not in [0, 1]: {frac}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction not in [0, 1]: {default_fraction}")

    frac_col = None
    for name, frac in fractions.items():
        cond = F.col(strata_col) == name
        lit = F.lit(float(frac))
        frac_col = F.when(cond, lit) if frac_col is None else frac_col.when(cond, lit)
    default_lit = F.lit(float(default_fraction))
    frac_col = default_lit if frac_col is None else frac_col.otherwise(default_lit)

    from pyspark.sql import Window

    per_stratum_total = F.sum("__cnt").over(Window.partitionBy(strata_col))
    return _bounded_group_head(
        df,
        [strata_col],
        key,
        buckets,
        cache_cutoffs,
        with_quota=lambda hist: hist.withColumn(
            "__k", F.floor(frac_col * per_stratum_total)
        ),
    )


def weighted_quota_sample(
    df: DataFrame,
    group_cols: list[str],
    budget: int | float,
    weight_col: str,
    key: str,
    buckets: int = 4096,
    cache_cutoffs: bool = True,
) -> DataFrame:
    """Keep rows per group until a WEIGHT budget is exhausted — the
    token-budget cap of a data-mixing recipe ("no language may
    contribute more than N tokens"), where ``quota_sample`` caps
    document COUNTS. Training-data budgets are stated in tokens, not
    documents, so this is the granularity a mixture spec actually uses.

    Semantics: the kept set is the maximal PREFIX of the group in
    (hash bucket, row hash, key) content-hash order whose cumulative
    ``weight_col`` stays ≤ ``budget`` (weights must be non-negative —
    the running sum is then monotone, so exceeded-stays-exceeded and
    the prefix is well-defined; rows are never split). Deterministic
    under repartition/retry/engine change, unbiased (hash order is
    content-random, so the kept mix is not size-biased), and MONOTONE:
    raising the budget only adds rows. The DuckDB oracle replays it as
    a plain running-sum window.

    Scale shape: identical to ``quota_sample`` — the per-(group,
    bucket) histogram sums weights instead of counting rows, buckets
    below the cutoff are kept outright, and only the boundary bucket
    computes an exact running weight (~1/``buckets`` of the hottest
    group). Same contracts: ``key`` row-unique, ``group_cols``
    NON-NULL."""
    if budget < 0:
        raise ValueError(f"budget must be non-negative, got {budget}")
    return _bounded_group_head(
        df,
        group_cols,
        key,
        buckets,
        cache_cutoffs,
        with_quota=lambda hist: hist.withColumn("__k", F.lit(budget)),
        weight_col=weight_col,
    )


def temperature_mix(
    df: DataFrame,
    domain_col: str,
    key: str,
    alpha: float = 0.5,
    buckets: int = 1000,
) -> DataFrame:
    """Temperature-flatten a skewed domain mixture: down-sample each
    domain with keep-rate ``(n_min / n_domain) ** (1 - alpha)`` — at
    ``alpha=1`` the corpus is untouched (natural distribution), at
    ``alpha=0`` every domain is cut to the smallest domain's size
    (uniform mixture), and in between the mixture is flattened the way
    LLM pretraining recipes temper dominant sources. Anchoring the rate
    to ``n_min`` (never above 1) keeps this a pure filter: rare domains
    are kept whole rather than impossibly upsampled.

    Membership is hash-bucket thresholded per domain, so it inherits the
    module's reproducibility contract (stable under repartition, retry,
    engine change) and is NESTED across temperatures: the threshold is
    monotone in ``alpha``, so raising ``alpha`` only ever ADDS rows to
    the kept set — tuning the temperature never churns membership.

    Scale shape: one map-side-partial count per domain (a domains-sized
    aggregate), thresholds derived on that tiny frame and broadcast back;
    the data-sized pass is a scan-side filter with no shuffle. For
    ``alpha=0.5`` the rate is computed with sqrt() rather than pow():
    IEEE-754 requires sqrt to be correctly rounded (pow is not), which
    makes the integer thresholds — and therefore membership — engine-
    portable bit-for-bit, the property the DuckDB oracle certifies.
    For any OTHER alpha the pow() branch is NOT certified bit-portable
    across engines (pow's last-ulp error may differ, and a borderline
    value could flip a floored threshold; ADVICE r7): membership is
    still deterministic WITHIN Spark — retries/repartition/engine
    version are safe — but cross-engine replay should either use
    alpha=0.5 or derive the thresholds once and ship them to both
    engines as literals.

    Returns kept rows with ``__mix_n_total`` / ``__mix_threshold``
    attached for census queries; callers not needing them can drop them.
    ``domain_col`` values must be NON-NULL: the threshold join is plain
    equality, so NULL-domain rows would be silently dropped rather than
    mixed.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__mix_n_total"))
    nmin = counts.agg(F.min("__mix_n_total").alias("__mix_n_min"))
    ratio = F.col("__mix_n_min").cast("double") / F.col("__mix_n_total")
    if alpha == 0.5:
        rate = F.sqrt(ratio)  # correctly rounded ⇒ cross-engine exact
    else:
        rate = F.pow(ratio, F.lit(1.0 - alpha))
    floored = F.floor(F.lit(float(buckets)) * rate).cast("int")
    thresholds = (
        counts.crossJoin(F.broadcast(nmin))
        .withColumn(
            "__mix_threshold",
            # a domain whose keep-rate rounds BELOW bucket resolution
            # would be dropped entirely where the temperature formula
            # intends a small sample — raise loudly (the hash_split
            # rounds-to-0 convention; evaluates on the dim-sized frame)
            F.when(
                floored < 1,
                F.raise_error(
                    F.concat(
                        F.lit(
                            "temperature_mix: keep-rate for domain "
                        ),
                        F.col(domain_col).cast("string"),
                        F.lit(
                            f" rounds to 0 of {buckets} buckets — raise "
                            "`buckets` for skews this extreme"
                        ),
                    )
                ).cast("int"),
            ).otherwise(floored),
        )
        .drop("__mix_n_min")
    )
    joined = df.join(F.broadcast(thresholds), domain_col)
    return joined.filter(hash_bucket(key, buckets) < F.col("__mix_threshold"))


def temperature_mix_exact(
    df: DataFrame,
    domain_col: str,
    key: str,
    alpha: float = 0.5,
    buckets: int = 4096,
    cache_cutoffs: bool = True,
    weight_col: str | None = None,
) -> DataFrame:
    """Temperature-flatten a skewed domain mixture with EXACT per-domain
    counts — the replacement-free counterpart of :func:`temperature_mix`
    (VERDICT r15 #8): where the Bernoulli hash-threshold form keeps a
    binomially-distributed ~rate·n rows per domain, this draws exactly
    ``floor(rate × n_domain)`` rows, the way a mixture spec states a
    recipe ("this domain contributes exactly N documents"). The rate is
    the same ``(n_min / n_domain) ** (1 - alpha)`` — and since both
    ``n_min`` and ``n_domain`` are ≥ 1, ``rate × n_domain =
    n_domain^alpha · n_min^(1-alpha) ≥ 1``: no domain ever floors to an
    empty quota, so the Bernoulli form's rounds-to-0 guard has no
    exact-count analogue to trip.

    Membership inherits the module contract (a pure function of row
    content — stable under repartition/retry/engine change) and is
    NESTED across temperatures like the Bernoulli form: the per-domain
    selection ORDER is fixed (it does not depend on ``alpha``), only the
    cutoff count moves, and the count is monotone in ``alpha`` — raising
    the temperature only ever ADDS rows.

    Two selection orders, one per weighting mode:

    - ``weight_col=None`` (the scale default): rows are taken in the
      module's content-hash prefix order (hash bucket, md5(key), key) —
      an unbiased uniform draw without replacement, executed by the
      ``quota_sample`` histogram-cutoff plan (:func:`_bounded_group_head`
      with the per-domain target joined onto the histogram): the exact-
      rank window sees only the single boundary bucket, ~1/``buckets``
      of the hottest domain, never the domain itself.
    - ``weight_col`` given: a weight-proportional draw — each domain's
      quota is filled by the top-``k`` derandomized A-Res priorities
      (``ln(hash_unit(key)) · max(w)/w``, the
      :func:`weighted_priority_sample` ranking, max-normalized per
      FRAME so the constant cancels in the order). This path ranks via
      a window partitioned by domain over the FULL domain (priorities
      are not bucketable the way the uniform hash is), so for domains
      hot enough that one WindowExec task matters, pre-cap with
      ``quota_sample`` or use the unweighted path. Weights must be
      positive (the A-Res guard raises on NULL/zero/negative).

    ``floor`` is applied to the same double arithmetic the Bernoulli
    form uses (``sqrt`` for ``alpha=0.5`` — correctly rounded, hence
    engine-portable bit-for-bit; ``pow`` otherwise, portable within
    Spark only — the :func:`temperature_mix` ADVICE r7 contract), and
    the oracle must replay the arithmetic OP-FOR-OP (divide, sqrt,
    multiply, floor) — algebraically equal rewrites like
    ``sqrt(n_min·n)`` round differently at the last ulp and can flip a
    floored count.

    Returns kept rows with ``__mix_n_total`` / ``__mix_k`` attached for
    census queries. ``domain_col`` values must be NON-NULL (equality
    join, the :func:`temperature_mix` contract); ``key`` must be
    row-unique.

    Scan economics: one more corpus aggregation than ``quota_sample``
    (the temperature targets need exact per-domain totals BEFORE the
    histogram pass — a fixed per-domain quota needs none), so the
    unweighted path is ~3 column-pruned passes of (domain, key). At
    100 TB, project the input to those two columns first; deriving the
    totals from the histogram itself would save the extra pass but
    couple the census columns to ``_bounded_group_head``'s internals —
    revisit only if the pass shows up in a real profile."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    reserved = {"__mix_n_total", "__mix_k"}
    if weight_col is not None:
        reserved |= {"__priority", "__wps_max", "__wps_rk"}
    clash = sorted(reserved & set(df.columns))
    if clash:
        raise ValueError(
            f"temperature_mix_exact: input already has column(s) {clash} — "
            "rename them first"
        )
    counts = df.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("__mix_n_total")
    )
    nmin = counts.agg(F.min("__mix_n_total").alias("__mix_n_min"))
    ratio = F.col("__mix_n_min").cast("double") / F.col("__mix_n_total")
    if alpha == 0.5:
        rate = F.sqrt(ratio)  # correctly rounded ⇒ cross-engine exact
    else:
        rate = F.pow(ratio, F.lit(1.0 - alpha))
    targets = (
        counts.crossJoin(F.broadcast(nmin))
        .withColumn(
            "__mix_k",
            F.floor(rate * F.col("__mix_n_total").cast("double")).cast("long"),
        )
        .drop("__mix_n_min")
    )
    if weight_col is None:
        kept = _bounded_group_head(
            df,
            [domain_col],
            key,
            buckets,
            cache_cutoffs,
            with_quota=lambda hist: hist.join(
                F.broadcast(targets.withColumnRenamed("__mix_k", "__k")),
                domain_col,
            ).drop("__mix_n_total"),
        )
        return kept.join(F.broadcast(targets), domain_col)
    w = F.col(weight_col)
    guarded = F.when(
        w.isNull() | (w <= 0),
        F.raise_error(
            F.lit(
                f"temperature_mix_exact: NULL/zero/negative {weight_col!r} — "
                "A-Res needs positive weights; filter or impute first"
            )
        ).cast("double"),
    ).otherwise(w.cast("double"))
    wmax = df.agg(F.max(guarded).alias("__wps_max"))
    pri = F.round(F.log(hash_unit(key)) * F.col("__wps_max") / guarded, 6)
    scored = (
        df.crossJoin(F.broadcast(wmax))
        .withColumn("__priority", pri)
        .drop("__wps_max")
        .join(F.broadcast(targets), domain_col)
    )
    from pyspark.sql import Window

    wnd = Window.partitionBy(domain_col).orderBy(
        F.col("__priority").desc(), F.col(key).asc()
    )
    return (
        scored.withColumn("__wps_rk", F.row_number().over(wnd))
        .filter(F.col("__wps_rk") <= F.col("__mix_k"))
        .drop("__wps_rk", "__priority")
    )


def global_hash_order(
    df: DataFrame,
    key: str,
    stage_cols: list[str] | None = None,
    buckets: int = 4096,
    rank_col: str = "global_rank",
) -> DataFrame:
    """Assign every row its exact 1-based position in the global
    curriculum order ``(stage_cols…, content-hash of key)`` — the
    deterministic training-order assignment of an LLM data pipeline
    (stages ordered easy→hard, rows hash-shuffled within a stage), with
    the module's reproducibility contract: the order is a pure function
    of row content, identical under repartition/retry/engine change, and
    APPEND-STABLE — new rows of a later stage never renumber earlier
    stages' rows relative to each other.

    Scale shape — the naive formulation (``row_number()`` over a global
    ORDER BY, or even one partitioned by stage) funnels all data — or an
    entire stage — through ONE WindowExec task. This implementation
    two-levels the rank exactly like ``quota_sample`` bounds its window:

    1. histogram: count rows per (stage, hash bucket) — a tiny
       stages × ``buckets`` aggregate with map-side partials;
    2. exclusive running sum over the HISTOGRAM (window over ≤ stages ×
       ``buckets`` rows, never the data) gives each (stage, bucket) its
       global offset;
    3. offsets broadcast back; ``row_number`` runs partitioned by
       (stage, bucket) — every window partition is an expected
       ``group_size / buckets`` rows regardless of data size — and
       ``global_rank = offset + within-bucket rank``.

    ``key`` must be row-unique (ties would make the order non-total),
    and ``key``/``stage_cols`` values NON-NULL — the offsets join is
    plain equality, so a NULL would silently drop the row from a
    row-preserving operator; the guard below raises instead.
    """
    stage_cols = list(stage_cols or [])
    null_cond = F.col(key).isNull()
    for c in stage_cols:
        null_cond = null_cond | F.col(c).isNull()
    b = F.when(
        null_cond,
        F.raise_error(
            F.lit(
                f"global_hash_order: NULL in key {key!r} or stage columns "
                f"{stage_cols!r} — the rank join would silently drop the row"
            )
        ).cast("int"),
    ).otherwise(hash_bucket(F.col(key), buckets))
    keyed = df.withColumn("__ob", b)
    hist = keyed.groupBy(*stage_cols, "__ob").agg(F.count(F.lit(1)).alias("__cnt"))
    from pyspark.sql import Window

    # histogram-only window: ≤ stages × buckets rows through one task
    w = Window.orderBy(*[F.col(c) for c in stage_cols], F.col("__ob"))
    offsets = (
        hist.withColumn("__off", F.sum("__cnt").over(w) - F.col("__cnt"))
        .drop("__cnt")
    )
    order_h = F.md5(F.col(key).cast("string"))
    wb = Window.partitionBy(*stage_cols, "__ob").orderBy(order_h, F.col(key))
    ranked = keyed.join(F.broadcast(offsets), [*stage_cols, "__ob"])
    return (
        ranked.withColumn(
            rank_col, (F.col("__off") + F.row_number().over(wb)).cast("long")
        )
        .drop("__ob", "__off")
    )


def balanced_shards(
    df: DataFrame,
    weight: Column,
    n_shards: int,
    key: str = "doc_id",
    shard_col: str = "shard",
    banded_weights: bool = False,
) -> DataFrame:
    """Assign every row to one of ``n_shards`` so per-shard total
    ``weight`` (e.g. token count) is balanced — the training-shard
    layout problem: unbalanced shards leave accelerators idle at epoch
    tails. Greedy LPT-style snake packing: rows rank globally by
    (weight desc, content-hash, key), then walk shards 0..n-1, n-1..0,
    0..n-1, … so each round pairs a heavy row on one shard with lighter
    rows on the others; per-shard totals land within one max-row-weight
    of each other on realistic weight mixes.

    Deterministic (pure function of row content — stable under
    repartition, retry, engine change) and APPEND-monotone in rank
    construction like the rest of this module. Scale shape: the global
    rank is :func:`global_hash_order`'s two-level histogram plan keyed
    by (negated weight, hash bucket) — the snake arithmetic is per-row
    codegen, and the histogram stays tiny ONLY while the weight column
    is low-cardinality (token counts are: distinct values ≤ max sequence
    length). The default exact form therefore requires a LOW-CARDINALITY
    weight; for high-cardinality weights (raw byte sizes, float scores)
    pass ``banded_weights=True`` to rank by the weight's eighth-power-of-
    two band (±~9% of the value) instead — the histogram stays ≤ ~512 ×
    buckets rows regardless of data. The trade is balance tightness:
    rows within a band order by content hash, so each band splits
    hash-randomly (a ~√(rows/shard) × band-jitter random walk, measured
    low-single-digit-percent spread on uniform weights) while the
    heavy-vs-light pairing ACROSS bands — where LPT earns its keep on
    heavy-tailed weights — is preserved.
    """
    if banded_weights:
        # heaviest band first: the band index grows with w, so negate
        stage = -F.floor(
            F.lit(8.0) * F.log2(weight.cast("double") + 1.0)
        ).cast("long")
    else:
        stage = -weight.cast("long")
    keyed = df.withColumn("__negw", stage)
    ranked = global_hash_order(
        keyed, key, stage_cols=["__negw"], rank_col="__rk"
    )
    pos = (F.col("__rk") - 1) % n_shards
    rnd = F.floor((F.col("__rk") - 1) / n_shards)
    snake = F.when(rnd % 2 == 0, pos).otherwise(n_shards - 1 - pos)
    return ranked.withColumn(shard_col, snake.cast("int")).drop(
        "__negw", "__rk"
    )


def doremi_weights(
    losses: DataFrame,
    domain_col: str = "domain",
    proxy_col: str = "proxy_loss",
    ref_col: str = "ref_loss",
    eta: float = 1.0,
    steps: int = 3,
    smoothing: float = 0.125,
) -> DataFrame:
    """DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi:
    Optimizing Data Mixtures Speeds Up Language Model Pretraining"):
    given per-domain PROXY-model and REFERENCE-model losses (a dim
    table — one row per domain, the published recipe's Group-DRO
    signal), up-weight domains with positive excess loss via
    multiplicative weights and smooth toward uniform. Returns
    ``(domain, excess_loss, weight)`` with weights summing to 1.

    Update rule: excess λ = max(proxy − ref, 0) (clipped — domains the
    proxy already fits get no boost), then ``steps`` rounds of the
    Littlestone–Warmuth multiplicative update ``w ← w·(1 + η·λ)`` from
    uniform, normalized, then smoothed ``w ← (1−c)·w + c/k`` exactly as
    the paper mixes in uniform to keep every domain sampled. With a
    static λ the T rounds collapse to ``(1+η·λ)^T``, computed as an
    UNROLLED product rather than pow()/exp(): +,−,×,÷ are required
    correctly-rounded by IEEE-754 while exp/pow are not, so identical
    literal inputs give bit-identical weights in any engine — the same
    portability argument as temperature_mix's sqrt (ADVICE r7). For a
    provably order-independent normalization feed λ values that are
    exact binary fractions (e.g. multiples of 1/64): every ``(1+η·λ)^T``
    term and their sum is then exact in doubles, so even summation
    order can't perturb the weights (the registered query's literal
    loss table does this).

    Scale shape: everything here is dim-sized (one row per domain) —
    the corpus is never touched; the frame broadcasts into whatever
    sampling plan consumes it.
    """
    if steps < 1:
        raise ValueError(f"steps must be >= 1, got {steps}")
    # r15 review sweep: a negative eta (excess>0 ⇒ base<1, possibly ≤0)
    # or smoothing outside [0,1] can produce NEGATIVE weights — every
    # downstream consumer (doremi_mix's min(n/w) cap, the thresholds)
    # then silently computes nonsense; the paper's recipe has η>0,
    # c∈[0,1], so reject sign bugs at the boundary
    if eta < 0:
        raise ValueError(f"eta must be non-negative, got {eta}")
    if not 0.0 <= smoothing <= 1.0:
        raise ValueError(f"smoothing must be in [0, 1], got {smoothing}")
    excess = F.greatest(
        F.col(proxy_col) - F.col(ref_col), F.lit(0.0)
    ).alias("excess_loss")
    base = F.lit(1.0) + F.lit(float(eta)) * F.col("excess_loss")
    w_raw = base
    for _ in range(steps - 1):
        w_raw = w_raw * base
    raw = losses.select(F.col(domain_col).alias("domain"), excess).select(
        "domain", "excess_loss", w_raw.alias("__w_raw")
    )
    tot = raw.agg(
        F.sum("__w_raw").alias("__s"), F.count(F.lit(1)).alias("__k")
    )
    c = float(smoothing)
    return raw.crossJoin(F.broadcast(tot)).select(
        "domain",
        "excess_loss",
        (
            F.lit(1.0 - c) * (F.col("__w_raw") / F.col("__s"))
            + F.lit(c) / F.col("__k")
        ).alias("weight"),
    )


def doremi_mix(
    df: DataFrame,
    losses: DataFrame,
    domain_col: str,
    key: str,
    eta: float = 1.0,
    steps: int = 3,
    smoothing: float = 0.125,
    buckets: int = 1000,
) -> DataFrame:
    """Realize a :func:`doremi_weights` mixture over the corpus as a
    deterministic hash-threshold sampling plan — the re-weighted
    counterpart of :func:`temperature_mix`, same membership contract
    (stable under repartition/retry/engine, nested under threshold
    growth). ``losses`` maps ``domain_col`` values to
    (proxy_loss, ref_loss).

    No-upsampling realization: with target shares w_i and domain sizes
    n_i, the largest achievable sample honoring every share without
    replicating rows is T_max = min_i(n_i / w_i); each domain keeps at
    rate ``w_i · T_max / n_i``, thresholded on :func:`hash_bucket` like
    every sampler in this module. The binding domain's rate is 1 in
    real arithmetic, but ``floor(buckets · w·T_max/n)`` in rounded
    double arithmetic can land at ``buckets − 1`` — i.e. the binding
    domain keeps ~1, up to one bucket (1/``buckets``) of rounding
    slack (ADVICE r11; the DuckDB oracle mirrors the same doubles
    term-for-term, so both engines land the identical threshold —
    clamping Spark-side alone would break the cross-engine contract). All
    arithmetic after the domain-count aggregate is correctly-rounded
    double ops on a dim-sized frame, mirrored term-for-term by the
    DuckDB oracle.

    Returns kept rows with ``__mix_n_total`` / ``__mix_weight`` /
    ``__mix_threshold`` attached for census queries. ``domain_col``
    values must be NON-NULL and covered by ``losses`` (equality joins —
    uncovered domains would be silently dropped, same contract as
    temperature_mix).
    """
    wts = doremi_weights(
        losses, eta=eta, steps=steps, smoothing=smoothing
    ).withColumnRenamed("domain", domain_col)
    counts = df.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("__mix_n_total")
    )
    dim = counts.join(F.broadcast(wts), domain_col)
    cap = dim.agg(
        F.min(
            F.col("__mix_n_total").cast("double") / F.col("weight")
        ).alias("__t_max")
    )
    floored = F.floor(
        F.lit(float(buckets))
        * (
            F.col("weight")
            * F.col("__t_max")
            / F.col("__mix_n_total").cast("double")
        )
    ).cast("int")
    thresholds = dim.crossJoin(F.broadcast(cap)).select(
        domain_col,
        "__mix_n_total",
        F.col("weight").alias("__mix_weight"),
        # doremi_weights' smoothing promises every domain stays sampled;
        # a rate below bucket resolution would silently break that —
        # raise loudly instead (dim-sized frame, same convention as
        # temperature_mix)
        F.when(
            floored < 1,
            F.raise_error(
                F.concat(
                    F.lit("doremi_mix: sample rate for domain "),
                    F.col(domain_col).cast("string"),
                    F.lit(
                        f" rounds to 0 of {buckets} buckets — raise "
                        "`buckets` for weights this small"
                    ),
                )
            ).cast("int"),
        )
        .otherwise(floored)
        .alias("__mix_threshold"),
    )
    joined = df.join(F.broadcast(thresholds), domain_col)
    return joined.filter(hash_bucket(key, buckets) < F.col("__mix_threshold"))


def _ntile_of_rank_sql(rank: str, k: int) -> str:
    """SQL for the exact tile of 1-based rank ``rank`` among ``__n``
    rows under SQL ntile(k) semantics (first ``__n % k`` tiles hold
    ``__n div k + 1`` rows); integer-only arithmetic. The else-branch
    divisor ``q`` is only reached when q >= 1 (when q = 0 every rank
    satisfies the first branch), so there is no division by zero."""
    q = f"(__n div {k})"
    rem = f"(__n % {k})"
    return (
        f"CASE WHEN {rank} <= {rem} * ({q} + 1) "
        f"THEN ({rank} - 1) div ({q} + 1) + 1 "
        f"ELSE {rem} + ({rank} - {rem} * ({q} + 1) - 1) div {q} + 1 END"
    )


def score_ntile(
    df: DataFrame,
    score_col: str,
    k: int,
    part_cols: list[str],
    key: str,
    ascending: bool = True,
    coarse_buckets: int = 512,
    tile_col: str = "tile",
) -> DataFrame:
    """Exact ``ntile(k)`` over ``(score_col, key)`` order within each
    ``part_cols`` partition — WITHOUT funneling each partition through
    one WindowExec sort (the same trap :func:`quota_sample` avoids):
    a billion-document language must not become a single straggler
    task just to learn which third of the quality distribution each
    document sits in (the CCNet head/middle/tail selection, Wenzek et
    al. 2020, is exactly this operator with k=3 on an LM score).

    Identical output to ``ntile(k) OVER (PARTITION BY part ORDER BY
    score [DESC], key)`` — the closed form of SQL ntile for 1-based
    rank r of n rows with q = n div k, rem = n mod k (the first rem
    tiles hold q+1 rows): ``r ≤ rem·(q+1) ? (r−1) div (q+1) + 1 :
    rem + (r − rem·(q+1) − 1) div q + 1``. (The folklore shortcut
    ``floor((r−1)k/n)+1`` is WRONG for k > n — it skips tile numbers —
    which the property test caught on a 2-row/k=4 input; the exact
    two-branch form is equality-tested against window ntile on
    arbitrary inputs.) Plan shape:

    1. coarse histogram: rows per (part, width_bucket(score)) — a
       small aggregate (parts × ≤coarse_buckets+2 rows), map-side
       partials; score→bucket is monotone, and equal scores share a
       bucket, so bucket ranges partition the rank axis exactly;
    2. running offsets over the HISTOGRAM (window over histogram rows,
       never the data) give every bucket its global rank range
       [before+1, cum] and the partition size n;
    3. buckets whose whole rank range maps to ONE tile (all but
       ≤ k−1 boundary buckets per partition) get their tile from the
       histogram arithmetic — no sort anywhere;
    4. only the boundary buckets — expected partition_size /
       coarse_buckets rows each — are exactly ranked (row_number
       within bucket by (score, key), a bucket-bounded window).

    ``key`` must be row-unique (total order), and ``part_cols`` AND
    ``score_col`` NON-NULL (equality joins; window ntile would rank a
    NULL score NULLS-FIRST in Spark but NULLS-LAST in DuckDB, so there
    is no portable semantics to promise — a NULL score raises at
    execution rather than silently vanishing through the NULL-bucket
    join, ADVICE r11). Ties in ``score`` break by ``key`` ascending,
    matching the oracle-form ORDER BY. Returns ``df`` plus ``tile_col``
    (1-based int).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    s = F.col(score_col) if ascending else -F.col(score_col)
    # min/max skip NULLs, so the range probe runs on the RAW score —
    # the loud NULL guard lives only in the __sb expression below,
    # which every row must pass through before any join can drop it
    # (measured: wrapping s itself put the guard inside the full-scan
    # min/max aggregate and the boundary sort for ~20% extra cost).
    rng = df.agg(
        F.min(s).alias("__lo"), F.max(s).alias("__hi")
    )
    # First branch: a NULL score raises at execution. Without it, a
    # NULL makes __sb NULL and the equi-join below silently DROPS the
    # row, while window ntile would have tiled it — NULLS-FIRST in
    # Spark but NULLS-LAST in DuckDB, so there is no portable
    # semantics to silently pick (ADVICE r11). The branch order
    # matters: the degenerate all-equal branch must not shadow the
    # guard.
    keyed = df.crossJoin(F.broadcast(rng)).withColumn(
        "__sb",
        F.when(
            F.col(score_col).isNull() | F.isnan(s.cast("double")),
            # NaN is as silent a killer as NULL and nastier: one NaN
            # score makes max() = NaN, width_bucket then returns NULL
            # for EVERY row and the equi-join drops the whole dataset
            F.raise_error(
                F.lit(
                    f"score_ntile: NULL/NaN in score column {score_col!r} — "
                    "filter or impute before tiling"
                )
            ).cast("long"),
        )
        .when(F.col("__hi") == F.col("__lo"), F.lit(1))
        .otherwise(F.width_bucket(s, "__lo", "__hi", F.lit(coarse_buckets))),
    )
    hist = keyed.groupBy(*part_cols, "__sb").agg(F.count(F.lit(1)).alias("__cnt"))
    w = Window.partitionBy(*part_cols).orderBy("__sb")
    wn = Window.partitionBy(*part_cols)
    cuts = (
        hist.withColumn("__cum", F.sum("__cnt").over(w))
        .withColumn("__before", F.col("__cum") - F.col("__cnt"))
        .withColumn("__n", F.max("__cum").over(wn))
        # first and last rank of the bucket land in the same tile ⇒
        # every row in the bucket shares it (monotone tile-of-rank)
        # exact SQL-ntile closed form in integer `div`/% (never `/`:
        # double division of near-2^53 products can land a hair below
        # an exact integer and truncate a tile boundary off by one)
        .withColumn("__t_first", F.expr(_ntile_of_rank_sql("(__before + 1)", k)))
        .withColumn("__t_last", F.expr(_ntile_of_rank_sql("__cum", k)))
    )
    joined = keyed.join(
        F.broadcast(
            cuts.select(
                *part_cols, "__sb", "__before", "__n", "__t_first", "__t_last"
            )
        ),
        [*part_cols, "__sb"],
    )
    interior = joined.filter(F.col("__t_first") == F.col("__t_last")).withColumn(
        tile_col, F.col("__t_first").cast("int")
    )
    wb = Window.partitionBy(*part_cols, "__sb").orderBy(s, F.col(key))
    boundary = (
        joined.filter(F.col("__t_first") != F.col("__t_last"))
        .withColumn("__r", F.col("__before") + F.row_number().over(wb))
        .withColumn(tile_col, F.expr(_ntile_of_rank_sql("__r", k)).cast("int"))
        .drop("__r")
    )
    return interior.unionByName(boundary).drop(
        "__lo", "__hi", "__sb", "__before", "__n", "__t_first", "__t_last"
    )


def epoch_upsample(
    df: DataFrame,
    rates: DataFrame,
    domain_col: str,
    key: str,
    rate_col: str = "rate",
    epoch_col: str = "epoch",
    max_rate: float = 100.0,
) -> DataFrame:
    """Deterministic WITH-upsampling mixture realization — the family
    member the no-upsampling contract deliberately excludes from its
    subsetting operators, stated the way pretraining recipes actually
    state it: "this domain runs N.M epochs". Every row of a domain with
    rate r is emitted ``floor(r)`` times, plus once more for the
    content-hash fraction of rows selected by derandomized stochastic
    rounding (``hash_unit(key) ≤ frac(r)``), so the domain's expected
    epoch count is exactly r while every decision stays a pure function
    of row content: stable under repartition/retry/engine change,
    replayable in SQL, and MONOTONE in r (raising a domain's rate only
    ever ADDS copies — tuning epochs never churns the realized set).
    Output rows carry ``epoch_col`` (1-based copy index), so downstream
    curriculum ordering can interleave epochs rather than concatenate
    them.

    Semantics per row: n_copies = floor(r) + (hash_unit(key) ≤ r −
    floor(r)); rows with n_copies = 0 (possible only when r < 1) drop —
    the fractional-epoch down-sampling case, same bucket convention as
    :func:`hash_sample`. An INTEGER rate never drops and never flips:
    frac = 0 and ``hash_unit`` is never ≤ 0 by construction (its range
    is (0, 1]), so r = 1.0 is exactly the identity and r = 2.0 exactly
    two copies — no boundary-luck rows.

    Scale shape: ``rates`` is dim-sized (one row per domain) and
    broadcast; the corpus pass is ONE scan-side projection — hash,
    arithmetic, ``explode(sequence(1, n_copies))`` — with no shuffle
    and no window anywhere. Replicated output lands naturally for a
    downstream ``global_hash_order`` pass keyed on (key, epoch).
    Rates must be non-negative and non-NULL (raises at execution, the
    weighted-quota convention); domains absent from ``rates`` drop via
    the inner join — pass an explicit rate-1.0 row to keep a domain
    untouched (silent pass-through would un-state the recipe).

    ``max_rate`` bounds the per-row copy count (ADVICE r16, the
    range_join max_replication convention): a fat-fingered rate — 225
    where 2.25 was meant — would otherwise explode every row of that
    domain 225× with nothing in the eventual OOM naming the cause.
    Real recipes upsample single-digit epochs; raise the cap
    explicitly if yours genuinely doesn't."""
    reserved = {epoch_col, "__eu_rate", "__eu_n"}
    clash = sorted(reserved & set(df.columns))
    if clash:
        raise ValueError(
            f"epoch_upsample: input already has column(s) {clash} — "
            "rename them or pass different output column names"
        )
    r = F.col(rate_col)
    guarded = F.when(
        r.isNull() | (r < 0),
        F.raise_error(
            F.lit(
                f"epoch_upsample: NULL/negative {rate_col!r} — epoch rates "
                "must be >= 0 (0 drops the domain explicitly)"
            )
        ).cast("double"),
    ).when(
        r > max_rate,
        F.raise_error(
            F.concat(
                F.lit(f"epoch_upsample: {rate_col!r} "),
                r.cast("string"),
                F.lit(
                    f" > max_rate={max_rate} — each such row would emit "
                    "that many copies; fix the rate or raise max_rate "
                    "explicitly"
                ),
            )
        ).cast("double"),
    ).otherwise(r.cast("double"))
    # duplicate domain rows in ``rates`` would silently MULTIPLY every
    # row's copy count through the join — raise instead (lazy window
    # over the dim-sized frame, no eager action)
    from pyspark.sql import Window

    dup = F.count(F.lit(1)).over(Window.partitionBy(domain_col))
    dim = rates.select(
        F.col(domain_col),
        F.when(
            dup > 1,
            F.raise_error(
                F.concat(
                    F.lit("epoch_upsample: duplicate rate rows for domain "),
                    F.col(domain_col).cast("string"),
                    F.lit(" — one rate per domain; aggregate your recipe first"),
                )
            ).cast("double"),
        )
        .otherwise(guarded)
        .alias("__eu_rate"),
    )
    base = F.floor(F.col("__eu_rate")).cast("int")
    frac = F.col("__eu_rate") - F.floor(F.col("__eu_rate"))
    # NULL key raises (the hash_split row-preserving convention): a
    # NULL hash would NULL the copy count and silently drop the row
    # even at integer rates, breaking the r=1.0-is-identity contract
    extra = F.when(
        F.col(key).isNull(),
        F.raise_error(
            F.lit(
                f"epoch_upsample: NULL {key!r} — epoch realization assigns "
                "every row an explicit copy count; filter or impute first"
            )
        ).cast("int"),
    ).otherwise((hash_unit(key) <= frac).cast("int"))
    joined = df.join(F.broadcast(dim), domain_col)
    n = (base + extra).alias("__eu_n")
    return (
        joined.select("*", n)
        .filter(F.col("__eu_n") >= 1)
        .select(
            *df.columns,
            F.explode(F.sequence(F.lit(1), F.col("__eu_n"))).alias(epoch_col),
        )
    )
