#!/usr/bin/env python
"""Scaling evidence: the heavy suite at sf0.1 vs a derived 10× corpus.

No sf1 testdata ships with the driver, so this script derives one from
the driver's own sf0.1 parquet (never modifying /root/testdata) into
``.scale/sf1/`` with transforms chosen to preserve each workload's
statistical shape while representing ORGANIC 10× growth (new content,
not 10 copies of the same content — naive duplication would make every
row a 10-way near-dup and blow candidate-pair counts quadratically):

- documents ×10: replica k suffixes every token with ``_k`` — a
  bijective vocabulary rename, so within-replica token/shingle Jaccard
  and dup-cluster structure are preserved EXACTLY, while cross-replica
  similarity collapses to ~0. Dup clusters grow 10× in count, not size.
- embeddings ×10: replica k sign-flips a seeded coordinate subset —
  norms and within-replica pairwise cosines are preserved exactly
  (same flip applied to every vector of the replica); cross-replica
  directions decorrelate.
- events ×10: event_id-offset copies with the SAME user population —
  10× events per user (denser sessions), the organic-growth shape.
- orders/lineitem ×10: orderkey-offset copies against the SAME
  customer/part/supplier dims — 10× facts per dim row.
- region/nation/customer/supplier/part: copied verbatim (dims don't
  grow 10× when facts do).

Usage:
  python scale_bench.py              # build (if absent) + timed suite,
                                     # prints one JSON line and writes it
                                     # to BENCH_SCALE.json
  python scale_bench.py --gen-only   # just build the derived corpus
  python scale_bench.py --smoke      # 2 replicas at sf0.01, one untimed
                                     # pass per query (generator + suite
                                     # sanity, ~a minute)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.path.join(REPO, ".scale", "sf1")
REPLICAS = 10
_OFFSET = 10_000_000

SUITE = {
    "dedup": [
        "docs_exact_dedup",
        "docs_incremental_dedup",
        "docs_stream_static_dedup_batch",
        "docs_shared_span_pairs",
        "docs_exact_substring_spans",
        # r16: the APPLIED cut — detect spans, merge intervals, rebuild
        # every doc via one codegen fold; the scale term to watch is the
        # corpus projection staying ~1x per replica over the detect cost
        "docs_span_removal_cut",
        "docs_line_dedup",
        # r12: intra-document line dedup — zero-shuffle scalar pass;
        # its ratio should track the documents scan (~1x per replica)
        "docs_intra_dedup",
        "docs_sketch_candidates_surface",  # r12 merge: minhash_lsh + simhash legs
        "docs_jaccard_pairs",
        "docs_fuzzy_match_pairs",
        "embedding_near_dups_lsh",
    ],
    "similarity": [
        "embedding_topk_surface",
        "embedding_ann_lsh_topk_lake",
        "embedding_ivf_topk_lake",
        "embedding_lsh_bucket_histogram",
        "embedding_batch_topk",
        # r14: PQ/ADC — probes read the 32x-compressed codes table only
        # (in-row literal-table fold, zero joins); the scale term is the
        # one-pass encode + codes scan
        "embedding_pq_adc_topk",
        "embedding_ivf_pq_topk",
        "docs_hybrid_search",
    ],
    "curation": [
        "docs_ngram_contamination",
        "docs_dedup_components",
        "docs_tfidf_similar_pairs",
    ],
    "text": [
        "docs_token_surface",  # r16 merge: token_stats + bpe_token_stats
        # r13: count-min sketch — the bounded-state aggregate; its ratio
        # should track the token-stream scan (sketch state is d×w cells
        # at ANY corpus size), plus the exact-top-15 baseline shuffle
        "docs_heavy_hitters_cms",
        # r14: HyperLogLog distinct census — the constant-state distinct
        # sibling of the CMS; register-wise MAX merge, state is <= m
        # cells per group at ANY cardinality, so the ratio should track
        # the fingerprint scan like the CMS tracks the token scan
        "docs_domain_distinct_hll",
        # r13: bigram-LM scoring — in-row pair extraction (zero-shuffle)
        # + one bigram-count shuffle + pre-reduced scoring join; the
        # scale term to watch is the AQE-decided bigram-table join
        "docs_bigram_perplexity",
        "docs_repetition_stats",
        # r10: carries the new unigram-LM leg — the interesting scale
        # term is the LM fit (vocab count shuffle) + broadcast re-join
        "docs_quality_surface",  # r16 merge: + per-source ratio leg
        "docs_lang_id",
        # first-class as of r7 (r6 measured both ad hoc as late additions)
        "docs_pii_scrub_surface",
        "docs_sequence_packing",
        "docs_chunk_windows",
        "docs_chunk_pack",
        # r16: distributed BPE merge training + encode census — the
        # scale claim under test is that the merge LOOP iterates on the
        # vocabulary-sized pair table (corpus passes are the one word
        # census in, one encode pass out), so 10× corpus ≈ scan cost,
        # not 10× per iteration
        "docs_bpe_merges",
    ],
    # r7 continuation: the data-mixing/ordering recipes — per-domain
    # quota capping (histogram-bounded exact rank), temperature-flattened
    # mixture sampling (tiny per-domain count agg + broadcast threshold
    # filter), curriculum ordering (histogram-offset global ranks), and
    # the four-stage end-to-end pipeline certification
    "mixing": [
        "docs_domain_quota",  # r10: + dsir_top200 leg (two LM fits + broadcast score)
        "docs_stratified_sample",  # r13: exact per-stratum fractional draw
        # r16: A-Res weighted draw — one scalar max agg + scan + top-n
        # (TakeOrderedAndProject / rank window); should track the scan
        "docs_weighted_sample",
        "docs_temperature_mix",
        "docs_curriculum_order",
        # r10: split census + balanced-shards leg (histogram-rank + snake)
        "docs_train_val_test_split",
        "docs_pipeline_end_to_end",
    ],
    "events": [
        "events_hourly_tumbling",
        "user_session_counts",
        "events_by_segment_salted_join",
        "asof_join_surface",
        "events_interval_join_batch",
        # r17: CMS join-size estimation — the estimate itself is a
        # broadcast join of two dim-sized sketch tables (cost
        # independent of data size); the scale terms are the one
        # filtered events scan -> per-(type, user) count aggregate
        # both sketches and both exact twins ride
        "events_join_size_cms",
    ],
    "tpc_joins": [
        "revenue_by_nation",
        "pricing_summary",
        "orders_q3_topk_surface",
        "best_order_per_customer",
    ],
    # r7: the materialized-layout read paths — the shapes whose whole
    # point is that cost should NOT grow with table size (clustered /
    # partition-pruned scans), plus the CSV ingestion entry point (linear
    # scan by design; certifies the growth is in the scan, not the plan)
    "lake_etl": [
        "lineitem_zorder_box_scan",
        "orders_lake_partitioned_scan",
        "events_csv_roundtrip",
        "events_etl_clean_seeded",
    ],
}


def build_scale_data(spark, src: str = SRC, dst: str = DST, replicas: int = REPLICAS) -> None:
    """Derive a ``replicas``× corpus from ``src`` into ``dst`` (see module
    docstring for the organic-growth transforms). Idempotent overwrite."""
    from pyspark.sql import functions as F

    from big_data_chicago_crimes_spark.sources.readers import load_table

    os.makedirs(dst, exist_ok=True)

    def write(df, name):
        df.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")

    # dims: verbatim copies
    for name in ("region", "nation", "customer", "supplier", "part"):
        target = f"{dst}/{name}.parquet"
        if os.path.isdir(target):
            shutil.rmtree(target)
        shutil.copyfile(f"{src}/{name}.parquet", target)

    docs = load_table(spark, src, "documents")
    doc_parts = [docs]
    for k in range(1, replicas):
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + _OFFSET * k).alias("doc_id"),
                # bijective token rename: "_" is a word character, so the
                # suffix stays ATTACHED to its token (one \w+ unit) — each
                # replica's vocabulary maps 1:1 onto fresh tokens and
                # within-replica shingle structure is preserved exactly.
                # ("_" also stops Java's $-group digit parsing in "$1_2".)
                F.regexp_replace("text", r"(\S+)", f"$1_{k}").alias("text"),
                "lang",
                "source",
            ).withColumn("n_chars", F.length("text").cast("long"))
        )
    write(_union(doc_parts), "documents")

    emb = load_table(spark, src, "embeddings")

    def _sign_flip(k: int):
        # replica-seeded ± mask over coordinates; same mask for every
        # vector of the replica, so within-replica cosines are exact
        def flip(x, i):
            return (
                F.when(F.pmod(F.xxhash64(F.lit(k), i), F.lit(2)) == 0, x)
                .otherwise(-x)
                .cast("float")
            )

        return flip

    emb_parts = [emb]
    for k in range(1, replicas):
        emb_parts.append(
            emb.select(
                (F.col("vec_id") + _OFFSET * k).alias("vec_id"),
                F.transform("embedding", _sign_flip(k)).alias("embedding"),
                "label",
            )
        )
    write(_union(emb_parts), "embeddings")

    events = load_table(spark, src, "events")
    ev_parts = [events]
    for k in range(1, replicas):
        ev_parts.append(events.withColumn("event_id", F.col("event_id") + _OFFSET * k))
    write(_union(ev_parts), "events")

    orders = load_table(spark, src, "orders")
    li = load_table(spark, src, "lineitem")
    o_parts, l_parts = [orders], [li]
    for k in range(1, replicas):
        o_parts.append(orders.withColumn("o_orderkey", F.col("o_orderkey") + _OFFSET * k))
        l_parts.append(li.withColumn("l_orderkey", F.col("l_orderkey") + _OFFSET * k))
    write(_union(o_parts), "orders")
    write(_union(l_parts), "lineitem")


def _union(parts):
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    from big_data_chicago_crimes_spark.plans.registry import all_queries
    from big_data_chicago_crimes_spark.session import get_spark

    smoke = "--smoke" in sys.argv
    src = os.environ.get("SPARK_GRAFT_CERT_SF_DIR", "/root/testdata/sf0.01") if smoke else SRC
    dst = os.path.join(REPO, ".scale", "smoke") if smoke else DST
    replicas = 2 if smoke else REPLICAS

    spark = get_spark(app_name="scale-bench")
    if smoke or not os.path.exists(f"{dst}/lineitem.parquet"):
        build_scale_data(spark, src, dst, replicas)
    if "--gen-only" in sys.argv:
        print(json.dumps({"generated": dst}))
        return

    queries = all_queries()

    from big_data_chicago_crimes_spark.session import release_scratch_caches

    def run(name: str, d: str) -> None:
        queries[name].build(spark, d).write.format("noop").mode("overwrite").save()
        release_scratch_caches()  # per-build scratch caches (ADVICE r7)

    names = [n for qs in SUITE.values() for n in qs]

    if smoke:
        for n in names:
            run(n, dst)
        print(json.dumps({"smoke": "ok", "generated": dst, "queries_run": len(names)}))
        return

    # Interleaved tiers (r10): the r10 full run exposed that measuring
    # all of sf0.1 then all of sf1 lets a multi-minute external load
    # burst hit ONE tier and silently bias ratios in either direction
    # (scan queries "improved" to 0.27× while token stats "degraded" to
    # 7× — both artifacts). Timing the two tiers back-to-back per query
    # per pass puts them under the same instantaneous environment, so
    # drift cancels in the ratio; best-of-3 then drops any pass a burst
    # still straddled.
    def timed(n: str, d: str) -> float:
        t0 = time.perf_counter()
        run(n, d)
        return time.perf_counter() - t0

    for d in (src, dst):  # warm pass per tier (also builds lake indexes)
        for n in names:
            run(n, d)
    small: dict[str, float] = {n: float("inf") for n in names}
    big: dict[str, float] = {n: float("inf") for n in names}
    for _ in range(3):
        for n in names:
            small[n] = min(small[n], timed(n, src))
            big[n] = min(big[n], timed(n, dst))
    report = {
        "metric": "scale_ratio_sf1_over_sf0.1",
        "replicas": replicas,
        "queries": {
            n: {
                "sf0.1_sec": round(small[n], 3),
                "sf1_sec": round(big[n], 3),
                "ratio": round(big[n] / small[n], 2) if small[n] > 0 else None,
            }
            for n in names
        },
    }
    with open(os.path.join(REPO, "BENCH_SCALE.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
