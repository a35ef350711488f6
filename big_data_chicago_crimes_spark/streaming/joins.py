"""Stream-stream joins, batch/stream symmetric.

The other streaming shapes (windowed aggs, session windows, dedup,
custom state) are covered in windows.py / stateful.py; this module adds
the remaining first-class Structured Streaming operator: the
watermarked stream-stream INTERVAL join ("purchases joined to the views
that preceded them within N minutes"), the streaming counterpart of the
batch as-of/interval analysis in operators/asof.py.

Semantics and scale shape: both inputs carry event-time watermarks and
the join condition carries a time-range bound, so Spark can (a) buffer
only the range-bounded slice of each side in the state store and (b)
evict state once the watermark passes — without the range bound a
stream-stream join's state grows forever. The builder is batch/stream
symmetric: over batch frames it degrades to a plain range join, which is
what the equality test exploits (same builder, both modes, identical
rows — tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchases_after_views_interval_join(
    purchases: DataFrame,
    views: DataFrame,
    window: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Each purchase joined to EVERY view by the same user within
    ``window`` before it (inner, possibly many views per purchase — the
    attribution fan-out; the one-row as-of variant is the batch
    operator's job). Columns are prefixed per side so the same builder
    works whether inputs are streaming or batch."""
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    v = views.select(F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"))
    if purchases.isStreaming:
        p = p.withWatermark("p_ts", watermark)
    if views.isStreaming:
        v = v.withWatermark("v_ts", watermark)
    cond = (
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {window}"))
    )
    return p.join(v, cond, "inner").select("p_user", "purchase_id", "p_ts", "v_ts")
