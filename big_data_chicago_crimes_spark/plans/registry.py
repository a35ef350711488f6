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
# ROUND-16 WINDOW (the mechanical cohort rotation, VERDICT r12 #1): at 100
# registered queries the two 50-query cohorts alternate windows every
# round or the 2-round staleness contract breaks. The r15 window (the
# r13 cohort: ETL / OLAP / join spine / streaming-batch /
# span-line-semantic dedup / pipeline — 50/50 hash-green in
# CORRECTNESS_r15) rotates OUT; the r14 cohort (ML / geo / dedup
# sketches / ANN / text / sampling) rotates IN, changed-builders-first
# per the r15 verdict's task #2 and the registry's own recorded plan:
# - ``orders_price_quantiles_approx`` FIRST: qsketch_build gained a
#   loud NaN guard and qsketch_quantile a [0,1] range check in the r15
#   sweep (18bbfb9) — its r14 stamp predates both; output-identical on
#   NaN-free data by construction, but the driver hash is the contract.
# - ``docs_span_removal_cut`` (NEW r16, VERDICT r15 #1): the recorded
#   slot plan executed — apply_span_removal (landed r15 pytest-only)
#   cuts the id_b-side maximal-span copies and the rebuilt corpus is
#   md5-pinned per doc; the oracle composes from the shared
#   _MSP_SPANS_CTES plus the segment-complement rebuild. Funded by the
#   docs_token_stats + docs_bpe_token_stats merge (docs_token_surface).
# - ``docs_weighted_sample`` (NEW r16, VERDICT r15 #3): the second
#   recorded slot plan — weighted_priority_sample (derandomized A-Res,
#   landed r15 pytest-only, max-normalized per ADVICE r15), fully
#   SQL-replayable oracle pins exact membership of both plan shapes.
#   Funded by the docs_quality_scores + docs_quality_by_source merge
#   (docs_quality_surface).
# - ``docs_domain_distinct_hll``: NEW 'overlap' leg (VERDICT r15 #5) —
#   hll_overlap_estimate's inclusion–exclusion over two stored split
#   sketches next to the exact distinct-intersection twin in the same
#   row; changed builder, early slot.
# - ``docs_sketch_candidates_surface`` / ``docs_sketch_seeded_recall``
#   / ``embedding_near_dups_lsh_seeded``: consumers of the r15
#   _sql_vec_expr quoting change — their r14 stamps predate it.
# - ``embedding_pq_adc_topk``: rides the r15 cancellation-safe
#   pq_encode_vectorized reformulation (6017cac) — parity-pinned, but
#   the driver hash is the contract.
# - ``embedding_semantic_dedup_vec``: assign_to_centroids_vectorized
#   switched to the chunked (x−y)² kernel THIS round (ADVICE r15) —
#   freshest change, early slot.
# - ``docs_token_surface`` / ``docs_quality_surface``: the two r16
#   funding merges — never sampled under the merged names; every leg
#   is an r14-green plan (plus the by_source leg's ratio columns).
# R17 SLOT PLAN (recorded r16, the weighted_priority_sample pattern):
# ``events_join_size_cms`` — cms_inner_product (operators/sketches.py,
# landed r16 pytest-proven: Cormode–Muthukrishnan §4.2 equi-join SIZE
# estimation from two STORED sketches, min-over-rows of per-row bucket
# dot products; never undercounts, exact-when-wide and
# disjoint/empty-input edge cases model-tested). Driver row shape: two
# legs over events user_id multisets — 'purchase_x_error' (cross join
# size) and 'purchase_self' (second moment / self-join size, the AMS F2
# use) — each as (pair, exact_join_size, cms_join_size_est,
# never_undercounts), exact twin = SUM(c_a*c_b) over joined per-key
# counts; sketch deliberately undersized (width 16) so collisions are
# organic, the docs_heavy_hitters_cms convention. Oracle replays the
# md5-bucket geometry exactly like the heavy-hitters oracle (same
# '0x'||substring(md5('cms'||r||'|'||k),1,8) cell hash) plus
# LEFT-JOIN-per-row dots with COALESCE(c,0) — the operator computes
# dots over sketch_a's row universe so a zero-overlap row participates
# in the min. NOT registered this round: the never-sampled tripwire
# would force it into the r16 window after that window was executed
# and stamped; register at the r17 rotation, funded by merge if slots
# are tight.
# In-round additions are funded by the established pair-merge pattern
# (merge two queries ALREADY inside this window into one result that
# certifies both operators — precedent purchaser_error_overlap —
# netting +1 slot each; merging across cohorts costs −2 and is never
# done). Note the SENTINEL constraint: bench.py's sentinel is
# events_count_by_type — it must never be merged away, or the
# clean-floor protocol loses its cross-round comparator.
CERTIFICATION_PRIORITY: tuple[str, ...] = (
    # --- r16 window: the r14 cohort rotates back in, changed-first ---
    "orders_price_quantiles_approx",  # FIRST: qsketch NaN/range guards (r15 sweep) postdate its r14 stamp
    "docs_span_removal_cut",  # NEW r16: ExactSubstr APPLIED, md5-pinned corpus — never sampled
    "docs_weighted_sample",  # NEW r16: derandomized A-Res membership — never sampled
    "docs_domain_distinct_hll",  # NEW 'overlap' leg: sketch inclusion–exclusion vs exact twin
    "docs_sketch_candidates_surface",  # _sql_vec_expr quoting change (r15) postdates r14 stamp
    "embedding_near_dups_lsh_seeded",  # same _sql_vec_expr change
    "docs_sketch_seeded_recall",  # same _sql_vec_expr change
    "embedding_pq_adc_topk",  # cancellation-safe pq_encode_vectorized (r15)
    "embedding_semantic_dedup_vec",  # chunked (x−y)² assign kernel (r16, ADVICE r15)
    "docs_token_surface",  # r16 merge: docs_token_stats + docs_bpe_token_stats — funds the cut row
    "docs_quality_surface",  # r16 merge: docs_quality_scores + docs_quality_by_source — funds A-Res
    "docs_bpe_merges",  # NEW r16: SQL-replayable iterative BPE training — never sampled
    # --- rest of the r14 cohort, order preserved from the r14 window ---
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
    "user_session_counts",
    # ------------------------------------------------------------------
    # r15 cohort (the r13-cohort queries; rotates back in for r17).
    # Order preserved from the r15 window; changed-builders-first rule
    # to be re-applied at the r17 rotation.
    # CHANGED-BUILDER PINS recorded for r17 (commits postdating the
    # r16 rotation that touch a builder below):
    # - ``lineitem_zorder_box_scan``: zorder_key gained the loud
    #   NaN-column guard in the r16 sweep (af5b058) — output-identical
    #   on NaN-free data by construction, but the driver hash is the
    #   contract; pin FIRST at the r17 rotation.
    # - ``multimodal_pipeline_stats``: sample_frames gained the stride
    #   (every_n_bytes >= 1) and loud-NULL-payload guards and
    #   resize_media the positive-target guard in the r16 bonus sweep —
    #   output-identical on valid fixtures (re-verified exact at
    #   sf0.01), but the builder changed; pin at r17.
    # - ``asof_join_surface``: asof_join rebuilt in the late-r16
    #   relational sweep — carried values now fill as ONE struct
    #   atomically (per-column last(ignorenulls) could mix columns from
    #   DIFFERENT right rows when a carried value was NULL), with the
    #   struct itself as the equal-(key, ts) tie-break (greatest
    #   carried-value tuple wins; native codegen comparison, A/B'd
    #   cost-neutral at sf0.1 after an md5-hash variant measured +30%).
    #   Output-identical on the dup-free NULL-carried-free fixture
    #   (re-verified exact at sf0.01 after BOTH commits), but the
    #   builder changed; pin at the r17 rotation.
    # Audited no-pin: the r16 batch rerank (4b2e0b3) is insertion-only
    # (cross_encoder_rerank itself unchanged ⇒ docs_hybrid_search
    # builder unchanged); the r16 stateful NaT fix touches
    # streaming/stateful.py, which no driver row builds through
    # (stream==batch is test-pinned); temperature_mix_exact (r16) is a
    # new function certified in-window on docs_weighted_sample.
    # ``docs_bpe_merges`` (NEW r16, slot 12): a never-sampled row MUST
    # sit inside the window (the tripwire below enforces it), so it
    # certifies THIS round. Window cost: the r14-cohort tail row
    # ``user_session_counts`` slides to slot 51 — its r14 stamp is
    # exactly 2 rounds old (the staleness contract's limit), so PIN IT
    # FIRST at the r17 rotation alongside lineitem_zorder_box_scan.
    # Bench/scale economics are untouched this round (the adopted r16
    # stamp predates the row; bench.py HEADLINE gains docs_bpe_merges
    # at r17 — recorded plan). The scale_bench SUITE half executed
    # EARLY (late r16): measured 1.27× at the 10× tier, amended into
    # BENCH_SCALE.json, and added to the SUITE.
    # EXECUTED EARLY (r16): the planned ``docs_hybrid_search``
    # 'ce_batch' legs landed this round — two queries share ONE
    # lexical-recall pass (both term-set counts in one groupBy; the
    # single-query legs' dedicated recall pass was merged away) and
    # ONE Arrow rerank pass via cross_encoder_rerank_batch; oracle
    # extended with the per-query UNION, verified exact at sf0.01 and
    # parity-tested at sf0.001. docs_hybrid_search is therefore a
    # CHANGED BUILDER in the r15 cohort — pin it FIRST at the r17
    # rotation alongside lineitem_zorder_box_scan and
    # user_session_counts. The bench stamp carries the documented
    # post-adoption patch (BENCH_ATTRIBUTION_r16.md, internally
    # consistent spread); BENCH_SCALE.json holds the post-leg 1.02×
    # amendment.
    # ------------------------------------------------------------------
    "asof_join_surface",
    "embedding_ivf_pq_topk",  # NEW r15: IVF-PQ probe vs materialized literal index
    "docs_exact_substring_spans",  # NEW r15: maximal spans + removal census
    "orders_q3_topk_surface",  # r15 merge: top_revenue_orders + shipping_priority_top10
    "exists_join_surface",  # r15 merge: late_shipment_orders + segment_customers_with_orders
    "docs_shared_span_pairs",
    "docs_domain_quota",
    "docs_bigram_perplexity",
    "multimodal_pipeline_stats",
    "orders_lake_partitioned_scan",
    "lineitem_zorder_box_scan",
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
