"""Mergeable sketches: count-min (frequency), HyperLogLog (distinct),
and equi-width histogram (quantiles).

Count-min sketch (Cormode & Muthukrishnan, "An improved data stream
summary: the count-min sketch and its applications", J. Algorithms
2005): ``depth`` independent hash rows × ``width`` buckets of counters;
``estimate(x) = min over rows r of counter[r][h_r(x)]``. Estimates
never undercount (every occurrence of ``x`` lands in exactly one
bucket per row) and overcount only by hash collisions, bounded by
``2N/width`` with probability ``1 - 2^-depth``.

HyperLogLog (Flajolet, Fusy, Gandouet & Meunier, "HyperLogLog: the
analysis of a near-optimal cardinality estimation algorithm", AofA
2007): ``m = 2^p`` registers, each holding the max rank (position of
the leading 1-bit) of the hash suffixes routed to it;
``estimate = α_m · m² / Σ_j 2^{-M_j}`` with linear counting below
``2.5m``. Relative error ≈ 1.04/√m (~3.2% at p=10). The distinct-
counting sibling of the CMS: constant ``m``-register state per group
regardless of cardinality, map-side partials are per-partition
sketches, the exchange is the register-wise MAX merge — where exact
COUNT(DISTINCT key) shuffles every distinct key, the HLL shuffles at
most ``m`` cells per group per partition, and sketches built on
disjoint splits merge losslessly (max is associative), so per-split /
per-day sketch tables can be stored and re-aggregated without
re-reading data.

Why this exists at 100 TB: exact per-token frequency is a shuffle keyed
by the full vocabulary (web-scale: billions of distinct tokens, heavy
skew on the head). The CMS build is a single pass whose aggregate state
is ``depth × width`` counters REGARDLESS of corpus size — map-side
partials combine per-cell counts, the shuffle moves at most
``depth × width`` cells per partition, and two sketches built on
disjoint splits merge by cell-wise addition (the groupBy below IS that
merge). Point-query estimation probes the broadcast sketch — no second
corpus pass.

Hashing is md5-derived (first 8 hex chars → bigint, mod ``width``) with
a per-row salt prefix, the same engine-portable convention the md5-twin
dedup queries use (dedup_queries.py), so a DuckDB oracle replays the
sketch bit-for-bit. xxhash64 would be ~3× cheaper per token; md5 is the
deliberate certification trade (hash cost is still one codegen'd
expression per row, and the sketch shape — not the hash — is what the
operator claims).

No analogue in the reference (Dataset.py aggregates exact counts only);
this is a training-data-pipeline extension (SURVEY §2 extensions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_bucket(col: Column, row_salt: str, width: int) -> Column:
    """Bucket index of ``col`` for one sketch row: md5 with the row's
    salt prefix, first 8 hex chars as an unsigned 32-bit int, mod
    ``width``. Non-negative by construction (conv of 8 hex chars)."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(row_salt), col)), 1, 8), 16, 10)
    return (h.cast("bigint") % width).alias("bucket")


def _row_salt(r: int) -> str:
    return f"cms{r}|"


def cms_build(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch from one pass over ``df[item_col]`` instances:
    ``(row, bucket, c)`` with at most ``depth × width`` rows.

    Each instance fans out to ``depth`` cells via an inline array
    explode (codegen'd scalar md5s, no shuffle); the groupBy is a
    bounded hash aggregate whose map-side partials ARE the per-partition
    sketches and whose exchange IS the cell-wise sketch merge.

    ``weight_col`` builds from PRE-AGGREGATED ``(item, count)`` rows
    instead of raw instances: each row contributes ``weight_col`` (an
    integral count, NULL-free) occurrences via SUM instead of COUNT.
    The result is bit-identical to the instance-built sketch — the
    scale idiom when a per-key count frame already exists (one corpus
    pass feeds counts AND sketch, events_join_size_cms).

    NULL items carry no identity and are dropped — the hll_build
    contract (r15 sweep: md5(NULL) is NULL, so NULL occurrences used to
    accumulate into phantom NULL-bucket state rows that no probe could
    ever match — harmless to estimates but silently bloating the stored
    sketch; SQL COUNT(x) ignores NULLs too, and any oracle replay
    filters identically).
    """
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                cms_bucket(F.col(item_col), _row_salt(r), width),
            )
            for r in range(depth)
        ]
    )
    keep = [weight_col] if weight_col else []
    occurrences = (
        F.sum(F.col(weight_col)).cast("bigint")
        if weight_col
        else F.count(F.lit(1))
    )
    return (
        df.filter(F.col(item_col).isNotNull())
        .select(*keep, F.explode(cells).alias("__cell"))
        .groupBy(
            F.col("__cell.row").alias("row"), F.col("__cell.bucket").alias("bucket")
        )
        .agg(occurrences.alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
    items_distinct: bool = False,
) -> DataFrame:
    """Point-query estimates for each distinct value in
    ``items[item_col]``: adds ``cms_cnt = min over rows of the item's
    bucket counter`` (0-coalesced: an untouched bucket means the item
    was never seen). ``depth``/``width`` must match the build.

    The sketch side is broadcast (≤ depth × width rows by construction)
    so estimation never shuffles the item side. The sketch's columns are
    renamed to reserved ``__cms_*`` names before the join so an items
    frame carrying ``row``/``bucket``/``c`` columns of its own cannot
    collide (the probe struct uses ``__cms_cell`` for the same reason).

    Output cardinality is DISTINCT ``items`` rows by construction
    (``dropDuplicates`` before the probe): the estimate is a property of
    the item VALUE, so duplicate probe rows would collapse in the final
    groupBy anyway — deduplicating first makes the documented
    "each distinct value" semantics explicit instead of a silent
    cardinality change for callers probing a non-distinct frame
    (ADVICE r13), and shrinks the probe-side explode. The dedup is one
    aggregate exchange BEFORE the broadcast probe — pure cost when the
    caller's frame is already distinct (the common probe shape, ADVICE
    r14): such callers pass ``items_distinct=True`` to skip it; the
    output contract is unchanged either way because the final groupBy
    over ``items.columns`` collapses duplicates regardless. Callers
    needing per-row estimates should join the result back on the item
    columns.
    """
    reserved = {"__cms_cell", "__cms_row", "__cms_bucket", "__cms_c", "cms_cnt"}
    clash = reserved & set(items.columns)
    if clash:
        raise ValueError(f"cms_estimate: items columns collide: {sorted(clash)}")
    if not items_distinct:
        items = items.dropDuplicates()
    probe = F.broadcast(
        sketch.select(
            F.col("row").alias("__cms_row"),
            F.col("bucket").alias("__cms_bucket"),
            F.col("c").alias("__cms_c"),
        )
    )
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                cms_bucket(F.col(item_col), _row_salt(r), width),
            )
            for r in range(depth)
        ]
    )
    probed = items.select(*items.columns, F.explode(cells).alias("__cms_cell")).join(
        probe,
        (F.col("__cms_cell.row") == F.col("__cms_row"))
        & (F.col("__cms_cell.bucket") == F.col("__cms_bucket")),
        "left",
    )
    return probed.groupBy(*items.columns).agg(
        F.min(F.coalesce(F.col("__cms_c"), F.lit(0))).alias("cms_cnt")
    )


def cms_validate_geometry(
    sketches: dict[str, DataFrame],
    depth: int | None,
    width: int | None,
    caller: str = "cms_validate_geometry",
) -> None:
    """Validate several sketches' observed cell ranges against a declared
    geometry in ONE Spark job (a unioned dim-sized agg), instead of one
    eager ``first()`` per operand per estimate call — the r17 job-count
    fix for builders that run multiple ``cms_inner_product`` legs over
    the same stored sketches (each eager action costs a full job launch;
    four of them dominated the events_join_size_cms build phase). Raises
    ``ValueError`` naming the offending sketch; ``caller`` prefixes the
    message so a direct caller's failure isn't misattributed to
    cms_inner_product (ADVICE r17). Same one-sided caveat: a
    narrower-than-claimed sketch still passes."""
    if depth is None and width is None:
        return
    tagged = None
    for side, sk in sketches.items():
        one = sk.agg(
            F.lit(side).alias("__side"),
            F.max("row").alias("max_row"),
            F.max("bucket").alias("max_bucket"),
        )
        tagged = one if tagged is None else tagged.unionAll(one)
    for row in tagged.collect():
        if row["max_row"] is None:
            continue  # empty sketch: nothing to validate
        if depth is not None and row["max_row"] >= depth:
            raise ValueError(
                f"{caller}: {row['__side']} has row {row['max_row']} "
                f">= declared depth {depth} — geometry mismatch"
            )
        if width is not None and row["max_bucket"] >= width:
            raise ValueError(
                f"{caller}: {row['__side']} has bucket "
                f"{row['max_bucket']} >= declared width {width} — geometry mismatch"
            )


def cms_inner_product(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    name: str = "join_size_est",
    depth: int | None = None,
    width: int | None = None,
    validate: bool = True,
) -> DataFrame:
    """Equi-join SIZE estimation from two stored sketches (Cormode &
    Muthukrishnan 2005 §4.2): the inner product a·b = Σ_x f_a(x)·f_b(x)
    — which IS |A ⋈ B| for an equi-join on x — estimated as
    ``min over rows r of Σ_w a[r,w]·b[r,w]``.

    Never undercounts (every x contributes f_a(x)·f_b(x) to its own
    bucket's product; collisions only ADD non-negative cross-terms) and
    overcounts by at most ``‖a‖₁·‖b‖₁ / width`` per row with probability
    ``1 - 2^-depth`` — the planner-side primitive for answering "how big
    would this join be?" at 100 TB WITHOUT running the join or
    re-reading either input: both operands are stored ``(row, bucket,
    c)`` tables of ≤ depth × width cells, so the estimate costs one
    broadcast join of two dim-sized frames, independent of data size.
    Both sketches must share depth/width/salt (the cms_build defaults).

    Per-row dots are computed over sketch_a's row universe with absent
    intersections coalesced to 0 — a row whose buckets never overlap
    yields dot 0 and MUST participate in the min (the estimate is 0:
    disjoint key sets), which an inner-join-then-min would silently
    skip. Empty sketch_a (built from an empty/all-NULL input) returns
    est 0 via the same coalesce, not an empty frame.

    Mismatched geometry CANNOT be detected from the stored ``(row,
    bucket, c)`` shape alone — two sketches built with different
    width silently join on bucket ids and return a plausible-looking
    but meaningless estimate (ADVICE r16). Callers that know the
    intended geometry pass ``depth``/``width``: each sketch's observed
    cell ranges are then checked against it eagerly (one tiny agg per
    sketch — sketches are ≤ depth × width rows by construction, but
    this does force lazy sketch plans early; stored-sketch tables, the
    intended operand shape, are dim-sized reads). The check is
    necessarily one-sided: a narrower-than-claimed sketch still passes
    (its buckets are in range), but the common fat-finger — probing a
    width-256 sketch against a width-16 one — fails loudly.
    """
    if validate and (depth is not None or width is not None):
        # one job for both operands (one when self-joining: a sketch
        # passed as both sides is validated once); callers running
        # several estimates over the same stored sketches should
        # pre-validate with cms_validate_geometry and pass
        # validate=False so the check costs one job total, not one per
        # operand per call
        sides = {"sketch_a": sketch_a}
        if sketch_b is not sketch_a:
            sides["sketch_b"] = sketch_b
        cms_validate_geometry(sides, depth, width, caller="cms_inner_product")
    per_row = (
        sketch_a.select(
            F.col("row"), F.col("bucket"), F.col("c").alias("__cms_ca")
        )
        .join(
            F.broadcast(
                sketch_b.select(
                    F.col("row"), F.col("bucket"), F.col("c").alias("__cms_cb")
                )
            ),
            ["row", "bucket"],
            "left",
        )
        .groupBy("row")
        .agg(
            F.sum(F.col("__cms_ca") * F.coalesce(F.col("__cms_cb"), F.lit(0))).alias(
                "__cms_dot"
            )
        )
    )
    return per_row.agg(
        F.coalesce(F.min("__cms_dot"), F.lit(0)).cast("bigint").alias(name)
    )


# --- HyperLogLog ---------------------------------------------------------
#
# Hashing follows the CMS convention: md5-derived (first 12 hex chars →
# a 48-bit non-negative bigint) so a DuckDB oracle replays registers
# bit-for-bit. The low ``p`` bits route to a register; the remaining
# ``q = 48 - p`` bits supply the rank ρ = (leading zeros of the q-bit
# suffix) + 1 ∈ [1, q+1], computed EXACTLY from the bit length of the
# suffix (length of its base-2 string — no floating-point log anywhere
# in the sketch state). The estimator's Σ 2^{-M_j} is likewise kept in
# INTEGER arithmetic as z_int = Σ_j 2^{K - M_j} with K = q+1 (absent
# registers contribute 2^K), so the sketch state is bit-exact across
# engines; floats enter only in the final α·m²·2^K / z_int division
# (and the linear-counting ln), both rounded at 6dp.

HLL_P = 10  # m = 1024 registers → ~3.2% relative error
_HLL_HEX = 12  # 48-bit hash: 12 hex chars keep the bigint positive


def _hll_q(p: int) -> int:
    return 4 * _HLL_HEX - p


def hll_cells(item: Column, p: int = HLL_P) -> Column:
    """The per-row routing cell ``struct(idx, rho)`` for one item — the
    scalar piece of :func:`hll_build`, exposed so compositions that
    cannot reuse the batch groupBy (e.g. the streaming windowed-distinct
    aggregation, which must interleave the window key) route items
    through EXACTLY the same hash/rank derivation. NULL items yield a
    NULL struct field — callers filter like hll_build does."""
    m = 1 << p
    q = _hll_q(p)
    h = F.conv(F.substring(F.md5(item), 1, _HLL_HEX), 16, 10).cast("bigint")
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(q + 1)).otherwise(
        F.lit(q + 1) - F.length(F.bin(w))
    )
    return F.struct((h % m).alias("idx"), rho.alias("rho"))


def hll_build(
    df: DataFrame, item_col: str, group_cols: list[str], p: int = HLL_P
) -> DataFrame:
    """Per-group HLL sketch from one pass over ``df``: ``(*group_cols,
    idx, m_rho)`` with at most ``2^p`` rows per group. One codegen'd md5
    per item (no explode — unlike the CMS each item touches exactly one
    register); the groupBy's map-side MAX partials ARE the per-partition
    sketches and its exchange IS the register-wise merge, so the shuffle
    moves ≤ m cells per group per partition no matter how many distinct
    items the group holds. NULL items carry no identity — md5(NULL)
    would otherwise route a phantom NULL register into the state — and
    are dropped (COUNT(DISTINCT x) ignores NULLs too; the oracle helper
    filters identically)."""
    cell = hll_cells(F.col(item_col), p)
    return (
        df.filter(F.col(item_col).isNotNull())
        .select(*group_cols, cell.alias("__c"))
        .select(*group_cols, "__c.idx", "__c.rho")
        .groupBy(*group_cols, "idx")
        .agg(F.max("rho").alias("m_rho"))
    )


def hll_merge(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Lossless union of two sketch tables built with the same ``p``:
    register-wise MAX. Because max is associative and commutative, a
    merge of sketches over disjoint splits equals the sketch built
    directly over the union — per-split sketch tables can be stored and
    re-merged without re-reading data (certified by the 'merged' leg of
    docs_domain_distinct_hll: merge-of-halves vs the oracle's direct
    global sketch under one driver hash)."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "idx")
        .agg(F.max("m_rho").alias("m_rho"))
    )


def hll_estimate(
    sketch: DataFrame, group_cols: list[str], p: int = HLL_P
) -> DataFrame:
    """Cardinality estimate per group: adds ``n_regs`` (touched
    registers), ``z_int`` (the integer harmonic-sum state Σ_j 2^{K-M_j},
    bigint — bit-exact across engines) and ``hll_est`` (α_m·m²·2^K /
    z_int, or linear counting m·ln(m/V) when the raw estimate is below
    2.5m and empty registers remain; rounded 6dp). The α·m²·2^K
    numerator is ONE Python-computed double literal so the Spark plan
    and any SQL oracle share the identical constant rather than each
    re-deriving it in a different evaluation order."""
    m = 1 << p
    q = _hll_q(p)
    k_max = q + 1
    alpha = 0.7213 / (1 + 1.079 / m)
    numer = alpha * m * m * float(1 << k_max)
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({k_max} - m_rho AS INT))")
        ).alias("__z_present"),
    )
    z_int = (
        F.col("__z_present")
        + (F.lit(m) - F.col("n_regs")) * F.lit(1 << k_max).cast("bigint")
    ).alias("z_int")
    v = (F.lit(m) - F.col("n_regs")).cast("double")
    raw = F.lit(numer) / F.col("z_int").cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("n_regs") < m),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(raw)
    return (
        agg.select(*group_cols, "n_regs", z_int, "__z_present")
        .select(
            *group_cols, "n_regs", "z_int", F.round(est, 6).alias("hll_est")
        )
    )


def hll_overlap_estimate(
    a: DataFrame, b: DataFrame, group_cols: list[str], p: int = HLL_P
) -> DataFrame:
    """Per-group OVERLAP estimate between two sketch tables via
    inclusion–exclusion: ``|A ∩ B| ≈ est(A) + est(B) − est(A ∪ B)``,
    with the union sketch from :func:`hll_merge` (lossless, so the
    third term is exact HLL — the error is the three estimates'
    combined, not compounded by approximation of the union itself).
    The cross-split overlap question this answers — how much does
    yesterday's crawl share with today's, does a training shard leak
    into an eval shard — normally costs a full distinct-key join; on
    stored sketch tables it costs three ``m``-register aggregates and
    touches no raw data. Output: (*group_cols, est_a, est_b, est_union,
    overlap_est) with ``overlap_est`` clamped at 0 (inclusion–exclusion
    on three ±1.04/√m estimates can go slightly negative for disjoint
    sets — a negative cardinality is never the right answer). Groups
    present in only one input get the other's estimate as 0 via the
    outer join — their overlap is genuinely 0.

    Only groups and registers shuffle; like every operator in the
    family this runs on the STORED state, so it composes across days /
    splits / engines (the merge contract docs_domain_distinct_hll
    certifies)."""
    est_a = hll_estimate(a, group_cols, p).select(
        *group_cols, F.col("hll_est").alias("est_a")
    )
    est_b = hll_estimate(b, group_cols, p).select(
        *group_cols, F.col("hll_est").alias("est_b")
    )
    est_u = hll_estimate(hll_merge(a, b, group_cols), group_cols, p).select(
        *group_cols, F.col("hll_est").alias("est_union")
    )
    joined = (
        est_u.join(est_a, group_cols, "left")
        .join(est_b, group_cols, "left")
        .na.fill({"est_a": 0.0, "est_b": 0.0})
    )
    overlap = F.greatest(
        F.round(F.col("est_a") + F.col("est_b") - F.col("est_union"), 6),
        F.lit(0.0),
    )
    return joined.select(
        *group_cols, "est_a", "est_b", "est_union", overlap.alias("overlap_est")
    )


def hll_oracle_sql(
    group_expr: str, item_expr: str, source_sql: str, p: int = HLL_P
) -> str:
    """The DuckDB replay of build→estimate over ``source_sql`` (a
    relation exposing ``group_expr`` and ``item_expr``): identical
    md5-derived routing, bit-length ranks, integer z state, and the
    SAME Python-interpolated α·m²·2^K constant the Spark plan bakes in.
    Lives next to the operators so query modules certifying HLL surfaces
    share one replay definition."""
    m = 1 << p
    q = _hll_q(p)
    k_max = q + 1
    alpha = 0.7213 / (1 + 1.079 / m)
    numer = alpha * m * m * float(1 << k_max)
    return f"""
        SELECT grp, n_regs, z_int,
               ROUND(CASE WHEN {numer!r} / CAST(z_int AS DOUBLE) <= {2.5 * m!r}
                          AND n_regs < {m}
                          THEN {float(m)!r} * ln({float(m)!r} /
                               CAST({m} - n_regs AS DOUBLE))
                          ELSE {numer!r} / CAST(z_int AS DOUBLE)
                     END, 6) AS hll_est
        FROM (
            SELECT grp, COUNT(*) AS n_regs,
                   -- DuckDB SUM(BIGINT) widens to HUGEINT; the state fits
                   -- comfortably in 63 bits (≤ m·2^K = 2^{p + k_max})
                   CAST(SUM(CAST(1 AS BIGINT) << ({k_max} - m_rho))
                        + ({m} - COUNT(*)) * (CAST(1 AS BIGINT) << {k_max})
                        AS BIGINT) AS z_int
            FROM (
                SELECT grp, idx, MAX(rho) AS m_rho FROM (
                    SELECT {group_expr} AS grp,
                           hv % {m} AS idx,
                           CASE WHEN hv // {m} = 0 THEN {k_max}
                                ELSE {k_max} - length(bin(hv // {m}))
                           END AS rho
                    FROM (
                        SELECT *, ('0x' || substring(md5({item_expr}), 1,
                                   {_HLL_HEX}))::BIGINT AS hv
                        FROM ({source_sql})
                        WHERE {item_expr} IS NOT NULL
                    )
                ) GROUP BY grp, idx
            ) GROUP BY grp
        )
    """


# --- Equi-width histogram quantile sketch --------------------------------
#
# The quantile member of the sketch family (CMS = frequency, HLL =
# distinct, this = quantiles). percentile_approx's GK sketch already
# gives mergeable WITHIN-QUERY quantiles, but its state is
# JVM-internal: it cannot be stored as a table, merged across
# days/splits after the fact, or replayed by another engine. This
# sketch CAN: the state is (group, bin, c) rows over a fixed value
# range — an equi-width histogram — whose merge is cell-wise ADDITION
# (the CMS merge), whose size is ≤ n_bins per group at any row count,
# and whose binning arithmetic reproduces bit-for-bit in any IEEE
# engine. Quantile estimates carry a deterministic error bound:
# the true quantile lies within the answering bin, so the error is
# ≤ one bin width ((hi-lo)/n_bins); callers size n_bins to the value
# range like CMS width to the mass budget. Values outside [lo, hi]
# clip into the edge bins (documented saturation, not an error — at
# 100 TB the range comes from cheap min/max stats or domain knowledge).


def qsketch_build(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lo: float,
    hi: float,
    n_bins: int = 1024,
) -> DataFrame:
    """Per-group histogram sketch from one pass: ``(*group_cols, bin,
    c)`` with ≤ ``n_bins`` rows per group. ``bin = floor((v - lo) *
    n_bins / (hi - lo))`` clamped to [0, n_bins-1] — the exact
    expression any SQL oracle replays (same literal order of
    operations). The groupBy's map-side partials ARE the per-partition
    sketches; the exchange is the cell-wise merge. NULL values carry no
    quantile information and are dropped (count them separately if the
    null rate matters). A NaN value RAISES at execution (r15 sweep, the
    score_ntile convention): Spark's ordering treats NaN as larger than
    every number, so the clamp would silently file every NaN into the
    TOP bin — corrupting the high quantiles with no error anywhere —
    and there is no portable semantics to silently pick (engines
    disagree on NaN ordering)."""
    if not hi > lo:
        raise ValueError(f"qsketch_build: need hi > lo, got [{lo}, {hi}]")
    v = F.col(value_col).cast("double")
    raw_bin = F.floor((v - F.lit(float(lo))) * F.lit(float(n_bins)) / F.lit(float(hi) - float(lo)))
    b = F.when(
        F.isnan(v),
        F.raise_error(
            F.lit(
                f"qsketch_build: NaN in value column {value_col!r} — the "
                "clamp would silently file it into the top bin; filter or "
                "impute first"
            )
        ).cast("long"),
    ).otherwise(F.least(F.greatest(raw_bin, F.lit(0)), F.lit(n_bins - 1))).cast(
        "int"
    )
    return (
        df.filter(v.isNotNull())
        .select(*group_cols, b.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def qsketch_merge(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Cell-wise sum of two sketch tables built with the same (lo, hi,
    n_bins): merge-of-splits equals sketch-of-union exactly (addition is
    associative/commutative — same contract as cms_build's groupBy)."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "bin")
        .agg(F.sum("c").cast("bigint").alias("c"))
    )


def qsketch_quantile(
    sketch: DataFrame,
    qs: list[float],
    group_cols: list[str],
    lo: float,
    hi: float,
    n_bins: int = 1024,
) -> DataFrame:
    """Quantile estimates per group from the sketch alone: for each q in
    ``qs``, the LOWER EDGE of the first bin whose cumulative count
    reaches ``ceil(q * n)`` — a deterministic integer-rank rule both
    engines replay exactly (no interpolation, so no float comparisons on
    cumulative sums). Output: one row per group with ``q_<label>``
    columns, each within one bin width of the true quantile. The window
    runs over ≤ n_bins rows per group — sketch-sized, never data-sized."""
    from pyspark.sql import Window

    if not qs:
        raise ValueError("qsketch_quantile: empty quantile list")
    bad = [q for q in qs if not 0.0 <= q <= 1.0]
    if bad:
        # a q outside [0,1] has no satisfying bin — the MIN() collapses
        # to NULL and the caller reads a silent NULL quantile (r15 sweep)
        raise ValueError(f"qsketch_quantile: quantiles outside [0, 1]: {bad}")
    w = Window.partitionBy(*group_cols).orderBy("bin") if group_cols else (
        Window.orderBy("bin")
    )
    width = (float(hi) - float(lo)) / n_bins
    cum = sketch.withColumn("__cum", F.sum("c").over(w)).withColumn(
        "__n", F.sum("c").over(Window.partitionBy(*group_cols))
    )
    aggs = []
    for q in qs:
        label = str(q).replace(".", "_")
        rank = F.ceil(F.lit(float(q)) * F.col("__n"))
        hit_bin = F.min(F.when(F.col("__cum") >= rank, F.col("bin")))
        aggs.append(
            (F.lit(float(lo)) + hit_bin * F.lit(width)).alias(f"q_{label}")
        )
    return cum.groupBy(*group_cols).agg(*aggs)


def qsketch_quantile_oracle_sql(
    group_expr: str,
    value_expr: str,
    source_sql: str,
    qs: list[float],
    lo: float,
    hi: float,
    n_bins: int = 1024,
) -> str:
    """DuckDB replay of build→quantile over ``source_sql``: identical
    binning expression, identical integer-rank rule. Lives next to the
    operators (the hll_oracle_sql convention)."""
    width = (float(hi) - float(lo)) / n_bins
    cols = ", ".join(
        f"{float(lo)!r} + MIN(CASE WHEN cum >= CEIL({float(q)!r} * n) "
        f"THEN bin END) * {width!r} AS q_{str(q).replace('.', '_')}"
        for q in qs
    )
    return f"""
        SELECT grp, {cols}
        FROM (
            SELECT grp, bin, SUM(c) OVER (PARTITION BY grp ORDER BY bin) AS cum,
                   SUM(c) OVER (PARTITION BY grp) AS n
            FROM (
                SELECT grp, bin, COUNT(*) AS c FROM (
                    SELECT {group_expr} AS grp,
                           LEAST(GREATEST(FLOOR((CAST({value_expr} AS DOUBLE)
                               - {float(lo)!r}) * {float(n_bins)!r}
                               / {float(hi) - float(lo)!r}), 0), {n_bins - 1})
                               AS bin
                    FROM ({source_sql})
                    WHERE {value_expr} IS NOT NULL
                ) GROUP BY grp, bin
            )
        ) GROUP BY grp
    """
