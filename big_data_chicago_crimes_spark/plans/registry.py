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

import functools
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
# (VERDICT r4 #3); tests/test_registry.py derives the staleness contract from
# the committed CORRECTNESS history, so a bad rotation fails CI.
#
# ROUND-17 WINDOW (executed at round START per VERDICT r16 #1 — the r16
# lesson: the tripwire evaluates the COMMITTED order now, not a planned
# future edit): the r15 cohort (ETL / OLAP / join spine /
# streaming-batch / span-line-semantic dedup / pipeline — 50/50
# hash-green in CORRECTNESS_r15) rotates back in, changed-builders
# first per the pins the r16 registry recorded:
# - ``user_session_counts`` FIRST: its r14 stamp sits exactly at the
#   2-round staleness limit (it slid to slot 51 when docs_bpe_merges
#   entered the r16 window) — the r16 tripwire failure this rotation
#   turns green.
# - ``asof_join_surface``: the late-r16 atomic-struct as-of rebuild
#   (65f48fc/a06f333) changed equal-timestamp tie-break semantics to
#   greatest-carried-tuple — the most semantically material pin; the
#   driver hash is the contract.
# - ``docs_hybrid_search``: the r16 ce_batch legs (two queries share
#   one lexical-recall pass + one Arrow rerank pass) postdate its r15
#   stamp.
# - ``lineitem_zorder_box_scan``: zorder_key's loud NaN-column guard
#   (af5b058, r16 sweep) postdates its r15 stamp.
# - ``multimodal_pipeline_stats``: sample_frames stride/NULL-payload
#   guards + resize_media positive-target guard (r16 bonus sweep)
#   postdate its r15 stamp.
# - ``events_join_size_cms`` (NEW r17, VERDICT r16 #2): the recorded
#   cms_inner_product slot plan executed — two legs over events
#   user_id multisets (purchase×error cross size + purchase self-join
#   size / AMS F2) vs the exact SUM(c_a·c_b) twin, width-16 sketch,
#   oracle replaying the md5 bucket geometry with COALESCE(c,0)
#   left-join dots. Never sampled.
# - ``events_filter_topk_surface`` (NEW r17 merge of purchase_top_users
#   + events_not_in_filter — the nested-predicate single-scan form):
#   never sampled under the merged name; both legs are r15-green plans.
# - ``events_type_stats_census``: changed builder — the former
#   events_null_census (A1) folded into the same ROLLUP as six
#   n_null_* aggregate columns (r17 merge).
# The two merges fund the two slots the window needs
# (user_session_counts pin + the new CMS row), the
# weighted_priority_sample funding pattern, fourth consecutive
# execution of the honest-deferral cycle.
#
# (The r16 window rationale — orders_price_quantiles_approx first on
# the qsketch guards, the docs_span_removal_cut / docs_weighted_sample
# slot plans, the _sql_vec_expr consumers, the two funding merges —
# is recorded in the r16 registry history, git 5f3b5c3^; all 50 rows
# landed green in CORRECTNESS_r16. The r16-recorded R17 SLOT PLAN for
# ``events_join_size_cms`` is executed above, exactly as specified.)
# In-round additions are funded by the established pair-merge pattern
# (merge two queries ALREADY inside this window into one result that
# certifies both operators — precedent purchaser_error_overlap —
# netting +1 slot each; merging across cohorts costs −2 and is never
# done). Note the SENTINEL constraint: bench.py's sentinel is
# events_count_by_type — it must never be merged away, or the
# clean-floor protocol loses its cross-round comparator.
CERTIFICATION_PRIORITY: tuple[str, ...] = (
    # --- r17 window: the r15 cohort rotates back in, changed-first ---
    "user_session_counts",  # FIRST: r14 stamp at the 2-round staleness limit (r16 tripwire subject)
    "asof_join_surface",  # late-r16 atomic-struct rebuild changed tie-break semantics
    "docs_hybrid_search",  # r16 ce_batch legs postdate its r15 stamp
    "lineitem_zorder_box_scan",  # r16 NaN-column guard postdates its r15 stamp
    "multimodal_pipeline_stats",  # r16 stride/resize guards postdate its r15 stamp
    "events_join_size_cms",  # NEW r17: CMS equi-join-size estimation vs exact twin — never sampled
    "events_filter_topk_surface",  # NEW r17 merge: purchase_top_users + events_not_in_filter
    "events_type_stats_census",  # changed builder: events_null_census folded in (r17 merge)
    # --- rest of the r15 cohort, order preserved from the r15 window ---
    "embedding_ivf_pq_topk",  # NEW r15: IVF-PQ probe vs materialized literal index
    "docs_exact_substring_spans",  # NEW r15: maximal spans + removal census
    "orders_q3_topk_surface",  # r15 merge: top_revenue_orders + shipping_priority_top10
    "exists_join_surface",  # r15 merge: late_shipment_orders + segment_customers_with_orders
    "docs_shared_span_pairs",
    "docs_domain_quota",
    "docs_bigram_perplexity",
    "orders_lake_partitioned_scan",
    "docs_stream_static_dedup_batch",
    "docs_stratified_sample",
    "docs_heavy_hitters_cms",
    "docs_line_dedup",  # C4-style line-level boilerplate removal
    "embedding_semantic_dedup",  # SemDeDup cluster-scoped pruning
    "events_etl_clean_seeded",
    "events_dedup_keyed",
    "events_csv_roundtrip",
    "events_json_profile",
    "events_count_by_type",  # the bench SENTINEL — never merge away
    "hourly_max_event_count",
    "purchaser_error_overlap",
    "users_distinct_exact_vs_approx",
    "events_by_segment_salted_join",
    "events_sliding_1h_30m",
    "orders_priority_fill_rollup",  # = orders_count_by_priority + orders_filled_pct
    "orders_by_price_band",
    "orders_quarter_pivot",
    "orders_grouping_surface",  # + 'pctl' leg = former orders_price_quantiles (r9)
    "orders_running_total",
    "lineitem_rollup",  # + corr columns (former lineitem_correlations, r9)
    "revenue_metric_surface",  # r13 merge: promo_revenue_pct + forecast_revenue_change
    "returned_item_top_customers",
    "supplier_nation_revenue",
    "part_catalog_surface",  # r13 merge: parts_never_ordered + top10_part_types
    "all_account_balances",
    "nation_balance_window_surface",  # = customer_balance_quartiles + nation_balance_extremes
    "docs_pipeline_end_to_end",
    "docs_temperature_mix",
    "docs_curriculum_order",
    "docs_chunk_windows",
    "embedding_near_dup_certification",
    "embedding_ivf_topk_lake_seeded",
    "ml_correlation_matrix",
    # ------------------------------------------------------------------
    # r16 window (the r14 cohort: ML / geo / dedup sketches / ANN /
    # text / sampling — 46 hash-green + 4 rows-only with hash-green
    # twins in CORRECTNESS_r16; user_session_counts was pinned up into
    # the r17 window above). Rotates back in for r18; re-apply the
    # changed-builders-first rule at that rotation.
    # CHANGED-BUILDER PINS recorded for r18 (r17 commits touching a
    # builder below):
    # - ``docs_heavy_hitters_cms`` consumers are NOT affected by the
    #   r17 cms_build weight_col extension (default path unchanged) or
    #   the cms_inner_product geometry validation (new optional args) —
    #   audited no-pin; events_join_size_cms certifies both this round.
    # ------------------------------------------------------------------
    "orders_price_quantiles_approx",
    "docs_span_removal_cut",  # NEW r16: ExactSubstr APPLIED, md5-pinned corpus
    "docs_weighted_sample",  # NEW r16: derandomized A-Res membership
    "docs_domain_distinct_hll",  # 'overlap' leg: sketch inclusion–exclusion vs exact twin
    "docs_sketch_candidates_surface",
    "embedding_near_dups_lsh_seeded",
    "docs_sketch_seeded_recall",
    "embedding_pq_adc_topk",
    "embedding_semantic_dedup_vec",
    "docs_token_surface",  # r16 merge: docs_token_stats + docs_bpe_token_stats
    "docs_quality_surface",  # r16 merge: docs_quality_scores + docs_quality_by_source
    "docs_bpe_merges",  # NEW r16: SQL-replayable iterative BPE training
    "ml_classifier_auc_surface",
    "ml_gbt_rmse",
    "docs_train_val_test_split",
    "embedding_batch_topk",
    "embedding_near_dups_lsh",
    "docs_lang_id",
    "orders_temporal_bucket_surface",  # r12 merge: year_range + season legs
    "geo_district_surface",
    "docs_fingerprint_census",
    "ml_kmeans_customer_clusters",
    "docs_jaccard_pairs",
    "docs_dedup_components",
    "docs_intra_dedup",
    "docs_fuzzy_match_pairs",
    "events_interval_join_batch",
    "docs_chunk_pack",
    "docs_exact_dedup",
    "docs_char_ngram_jaccard",
    "docs_incremental_dedup",
    "docs_sketch_md5_surface",  # r14 merge: minhash_md5 + simhash_md5 legs
    "docs_ngram_contamination",
    "docs_tfidf_similar_pairs",
    "embedding_topk_surface",
    "embedding_lsh_bucket_histogram",
    "embedding_ann_lsh_topk_lake",
    "embedding_ivf_topk_lake",
    "docs_repetition_stats",
    "docs_rolling_hash",
    "docs_rolling_hash_md5_oracled",
    "docs_pii_scrub_surface",  # r14 merge: organic + seeded scrub legs
    "docs_sequence_packing",
    "docs_sampling_census",
    "revenue_by_nation",
    "pricing_summary",
    "orders_monthly_window_surface",
    "best_order_per_customer",
    "customer_balance_rank_in_nation",
    "events_hourly_tumbling",
)


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[Builder], Builder]:
    """Decorator: register a query builder under ``name``."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        # Each top-level build is its own scratch-cache generation, so
        # the cap's eviction-visibility warning distinguishes "one build
        # overflowed the cap" (warn) from "steady-state FIFO turnover of
        # prior builds' frames in a never-releasing session" (silent) —
        # ADVICE r10, session.py:mark_build_boundary.
        @functools.wraps(fn)
        def build(spark: SparkSession, sf_dir: str) -> DataFrame:
            from big_data_chicago_crimes_spark.session import mark_build_boundary

            mark_build_boundary()
            return fn(spark, sf_dir)

        REGISTRY[name] = Query(
            name=name, build=build, oracle=oracle, tags=tags, doc=(fn.__doc__ or "").strip()
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
