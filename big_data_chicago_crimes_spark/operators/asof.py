"""As-of (point-in-time) join — an operator Spark has no native form of
(guide: compose built-ins before reaching for applyInPandas).

Semantics (backward as-of, the TimescaleDB/kdb/pandas ``merge_asof``
default): for each left row, the single right row with the same key and
the LARGEST right_ts ≤ left_ts.

Implementation is the scalable union+window composition, not a range
join and not a per-group ``pd.merge_asof``:

1. tag both sides and union by name (right contributes key, ts, and
   ONE struct packing all carried value columns);
2. one window per key ordered by (ts, side, carried-value struct) —
   right rows sort BEFORE left rows at equal timestamps, giving ≤
   (not <) semantics; equal-(key, ts) right rows resolve
   deterministically to the greatest carried-value tuple (carried
   columns of non-orderable types — maps, or structs containing
   maps — drop the struct from the ordering and keep (ts, side)
   only, trading that one determinism guarantee for generality);
3. ``last(struct, ignorenulls=True)`` over an unbounded-preceding frame
   forward-fills each matched right ROW atomically onto subsequent left
   rows (per-column fills could mix columns across right rows whenever
   a carried value is NULL);
4. keep left rows, unpack the struct; inner variant drops unmatched.

Cost: ONE shuffle on the key (the same partitioning both inputs would
need anyway) + a per-partition sort — no row explosion, no skewed range
bucketing, works at any scale where the key cardinality distributes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _is_orderable(dt: T.DataType) -> bool:
    """Whether Spark can sort on a column of this type: maps are not
    orderable (analysis error under ORDER BY), arrays/structs are
    orderable iff their element/field types are."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _is_orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_is_orderable(f.dataType) for f in dt.fields)
    return True


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    how: str = "inner",
) -> DataFrame:
    """Backward as-of join. Returns all left columns plus, for each
    ``right_vals`` column ``v``, a ``v_asof`` column from the matched
    right row (and ``{right_ts}_asof`` for the matched timestamp)."""
    carried = [right_ts, *right_vals]
    # Reserved-name guard (the cms_estimate convention): a left column
    # named __side/__ets/__vals or matching an *_asof output would
    # merge through unionByName into the forward-fill chain — left values
    # would masquerade as right-side fills, a silent wrong answer. Raise.
    reserved = {"__side", "__ets", "__vals"} | {f"{c}_asof" for c in carried}
    clash = sorted(reserved & set(left.columns))
    if clash:
        raise ValueError(
            f"asof_join: left columns collide with reserved names {clash} — "
            "rename them before joining"
        )
    l_tagged = left.withColumn("__side", F.lit(1)).withColumn("__ets", F.col(left_ts))
    # A NULL right_ts can satisfy "largest ts <= left_ts" for NO left
    # row, but the window sorts NULLs FIRST — an unfiltered NULL-ts
    # right row would forward-fill its values onto every left row before
    # the first real right row (a silent wrong answer on messy data;
    # r14 join-spine review). NULL LEFT ts rows also sort before every
    # (filtered) right row, so they surface unmatched — consistent with
    # "no right row <= NULL" and with merge_asof's treatment.
    #
    # Carried values ride in ONE struct filled atomically (r16 sweep):
    # per-column last(ignorenulls) fills could MIX columns from different
    # right rows whenever a carried value is NULL — for right rows
    # (ts=5, a=1, b=NULL), (ts=3, a=NULL, b=9), a left row at ts=6
    # filled (a=1, b=9): values from two different matched rows, where
    # the as-of match is by definition ONE row (a=1, b=NULL from ts=5).
    # The struct is non-null for every right row (a struct OF nulls is
    # not null), so ignorenulls skips exactly the left rows.
    r_tagged = (
        right.filter(F.col(right_ts).isNotNull())
        .select(
            F.col(key),
            F.col(right_ts).alias("__ets"),
            F.struct(*[F.col(c).alias(f"{c}_asof") for c in carried]).alias("__vals"),
        )
        .withColumn("__side", F.lit(0))
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # Equal-(key, ts) right rows previously filled in partition order —
    # nondeterministic under retry/repartition. The struct itself is the
    # tie-break: field-wise struct comparison is native codegen (an md5
    # content hash measured +30% on the whole join), deterministic, and
    # meaningful — the greatest carried-value tuple wins. Left rows
    # carry a NULL struct but __side already orders them after every
    # equal-ts right row.
    #
    # The struct tie-break requires every carried column to be of an
    # ORDERABLE type (ADVICE r16): a map-typed carried column (or a
    # struct containing one) fails at analysis under ORDER BY. Such
    # columns fall back to (ts, side)-only ordering — matching is still
    # correct and the fill is still one atomic struct; only the choice
    # AMONG exactly-duplicate-(key, ts) right rows reverts to partition
    # order (nondeterministic under retry ONLY for that degenerate
    # input shape, the pre-r16 behavior for all inputs).
    order_cols = [F.col("__ets"), F.col("__side")]
    vals_type = r_tagged.schema["__vals"].dataType
    if _is_orderable(vals_type):
        order_cols.append(F.col("__vals"))
    w = (
        Window.partitionBy(key)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.withColumn("__vals", F.last("__vals", ignorenulls=True).over(w))
    out = filled.filter(F.col("__side") == 1).select(
        *left.columns,
        *[F.col(f"__vals.{c}_asof").alias(f"{c}_asof") for c in carried],
    )
    if how == "inner":
        out = out.na.drop(subset=[f"{right_ts}_asof"])
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    max_replication: int = 10_000,
) -> DataFrame:
    """Point-in-interval join: each point row matched to every interval
    with start ≤ point < end. Inner semantics only: the exact inequality
    runs as a residual filter AFTER the bucket equi-join, which would
    silently drop any outer join's null-extended rows — so no ``how``
    parameter is offered.

    Naive Spark plans a non-equi join as BroadcastNestedLoop (O(n·m)).
    This bucketizes instead: points get bucket = floor(point/w); each
    interval explodes to the buckets it covers; the join becomes an
    EQUI-join on bucket (hash-partitionable, AQE-optimizable) followed
    by the exact inequality filter. Interval replication factor is
    len/w + 1 — pick ``bucket_width`` near the typical interval length.

    ``max_replication`` bounds the per-interval explode: ONE interval
    spanning len/w ≫ typical (a sentinel end-date, a corrupt bound, a
    mis-chosen width) would replicate into millions of rows and OOM an
    executor with nothing in the error naming the cause. The guard is a
    per-row codegen branch that raises loudly with the offending span
    size instead (r16 relational-core sweep).
    """
    reserved_clash = sorted(
        {"__bucket"} & (set(points.columns) | set(intervals.columns))
    )
    if reserved_clash:
        raise ValueError(
            f"range_join: input columns collide with reserved {reserved_clash}"
        )
    p = points.withColumn(
        "__bucket", F.floor(F.col(point_col) / bucket_width).cast("long")
    )
    # Degenerate intervals (end <= start, or NULL bounds) match no point
    # under [start, end) — drop them BEFORE the explode: F.sequence with
    # start > stop silently generates a DESCENDING range, so one reversed
    # interval would otherwise replicate across every bucket it spans in
    # the wrong direction (an unbounded blow-up the residual filter only
    # pays for, never surfaces; r14 join-spine review).
    b_lo = F.floor(F.col(start_col) / bucket_width).cast("long")
    b_hi = F.floor(F.col(end_col) / bucket_width).cast("long")
    n_buckets = b_hi - b_lo + F.lit(1)
    iv = intervals.filter(F.col(start_col) < F.col(end_col)).withColumn(
        "__bucket",
        F.explode(
            F.when(
                n_buckets > max_replication,
                F.raise_error(
                    F.concat(
                        F.lit("range_join: one interval spans "),
                        n_buckets.cast("string"),
                        F.lit(
                            f" buckets > max_replication={max_replication} "
                            f"(bucket_width={bucket_width}) — widen the "
                            "buckets, clamp the interval, or raise the cap"
                        ),
                    )
                ).cast("array<bigint>"),
            ).otherwise(F.sequence(b_lo, b_hi))
        ),
    )
    joined = p.join(iv, "__bucket", "inner").drop("__bucket")
    return joined.filter(
        (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col))
    )
