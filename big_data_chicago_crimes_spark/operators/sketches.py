"""Mergeable frequency sketches.

Count-min sketch (Cormode & Muthukrishnan, "An improved data stream
summary: the count-min sketch and its applications", J. Algorithms
2005): ``depth`` independent hash rows × ``width`` buckets of counters;
``estimate(x) = min over rows r of counter[r][h_r(x)]``. Estimates
never undercount (every occurrence of ``x`` lands in exactly one
bucket per row) and overcount only by hash collisions, bounded by
``2N/width`` with probability ``1 - 2^-depth``.

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
    df: DataFrame, item_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the sketch from one pass over ``df[item_col]`` instances:
    ``(row, bucket, c)`` with at most ``depth × width`` rows.

    Each instance fans out to ``depth`` cells via an inline array
    explode (codegen'd scalar md5s, no shuffle); the groupBy is a
    bounded hash aggregate whose map-side partials ARE the per-partition
    sketches and whose exchange IS the cell-wise sketch merge.
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
    return (
        df.select(F.explode(cells).alias("__cell"))
        .groupBy(
            F.col("__cell.row").alias("row"), F.col("__cell.bucket").alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
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
    """
    reserved = {"__cms_cell", "__cms_row", "__cms_bucket", "__cms_c", "cms_cnt"}
    clash = reserved & set(items.columns)
    if clash:
        raise ValueError(f"cms_estimate: items columns collide: {sorted(clash)}")
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
