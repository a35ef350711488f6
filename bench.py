#!/usr/bin/env python
"""Benchmark harness: times the engine's headline queries.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is executed twice: a warm-up pass (JIT, codegen, file
listing) is NOT counted — we measure steady-state execution the way a
resident engine would serve it — then a timed pass. Timing wraps a
``count()``-free action: ``write.format("noop")`` exercises the full
plan including result materialization without driver collection.
"""

from __future__ import annotations

import json
import os
import time

HEADLINE = [
    # reference-derived analytical spine
    "events_count_by_type",
    "hourly_max_event_count",
    "orders_quarter_pivot",
    "orders_moving_avg_3m",
    "purchase_top_users",
    "event_value_stats",
    "orders_by_season",
    # joins / TPC-H shapes
    "revenue_by_nation",
    "pricing_summary",
    "top_revenue_orders",
    "best_order_per_customer",
    "segment_customers_with_orders",
    "shipping_priority_top10",
    "returned_item_top_customers",
    "supplier_nation_revenue",
    # window functions
    "orders_running_total",
    "orders_monthly_delta",
    "customer_balance_rank_in_nation",
    "customer_balance_quartiles",
    "forecast_revenue_change",
    # time windows (streaming batch twins)
    "events_hourly_tumbling",
    "events_sliding_1h_30m",
    "user_session_counts",
    # text suite
    "docs_token_stats",
    "docs_quality_by_source",
    "docs_lang_id",
    "docs_bpe_token_stats",
    "docs_fingerprint_census",
    "docs_rolling_hash",
    # dedup / similarity
    "docs_exact_dedup",
    "docs_minhash_lsh_candidates",
    "docs_jaccard_pairs",
    "embedding_cosine_topk",
    "embedding_ann_lsh_topk",
    "events_json_extract",
    # OLAP widening
    "lineitem_rollup",
    "orders_cube",
    "purchase_after_view_asof",
    "orders_by_price_band",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from big_data_chicago_crimes_spark.plans.registry import all_queries
    from big_data_chicago_crimes_spark.session import get_spark

    spark = get_spark(app_name="bench")
    queries = all_queries()

    def run(name: str) -> None:
        df = queries[name].build(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        run(name)  # warm-up: codegen + file listing + JIT, not counted
        best = float("inf")
        for _ in range(3):  # best-of-3: robust to host contention
            t0 = time.perf_counter()
            run(name)
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
