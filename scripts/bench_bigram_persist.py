#!/usr/bin/env python
"""Interleaved A/B: docs_bigram_perplexity's per-doc scored frame —
scratch-persist vs recompute-per-leg.

The query's two legs ('source' aggregate, 'tail5' TakeOrdered) both
consume the bigram_logprob frame; without a persist the whole scoring
plan (pair extraction, bigram-count shuffle, three joins) runs once per
leg. The scored frame is narrow (doc_id, source, lp — doc-count-sized),
so this is the shape where the persist discipline's fill-cost question
is live. Arms alternate per pass (A = persist, B = recompute) so
environment drift hits both equally; a sentinel run brackets the series.

Usage: python scripts/bench_bigram_persist.py [sf_dir] [passes]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_chicago_crimes_spark.operators.curation import bigram_logprob
from big_data_chicago_crimes_spark.session import get_spark, scratch_persist
from big_data_chicago_crimes_spark.sources.readers import load_tables


def _legs(scored):
    # the SHIPPED leg shape — imported, not copied, so the A/B verdict
    # can never drift from what the query actually runs
    from big_data_chicago_crimes_spark.queries.curation_queries import (
        bigram_perplexity_legs,
    )

    return bigram_perplexity_legs(scored)


def run_arm(spark, sf_dir, persist):
    t = load_tables(spark, sf_dir)
    scored = bigram_logprob(t.documents, "text", "doc_id", carry_cols=("source",))
    if persist:
        scored = scratch_persist(scored)
    t0 = time.time()
    n = _legs(scored).count()
    dt = time.time() - t0
    if persist:
        scored.unpersist()
    return n, dt


def sentinel(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    t0 = time.time()
    t.events.groupBy("event_type").count().collect()
    return time.time() - t0


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark(app_name="bigram-persist-ab", shuffle_partitions=32)
    run_arm(spark, sf_dir, False)  # warm the scan/session
    a, b, sent = [], [], []
    for i in range(passes):
        sent.append(sentinel(spark, sf_dir))
        first = i % 2 == 0
        for persist in ([True, False] if first else [False, True]):
            n, dt = run_arm(spark, sf_dir, persist)
            (a if persist else b).append(dt)
    sent.append(sentinel(spark, sf_dir))
    print(f"rows={n} sf={sf_dir}")
    print(f"A persist   : {sorted(a)} min={min(a):.3f}")
    print(f"B recompute : {sorted(b)} min={min(b):.3f}")
    print(f"sentinel    : {[round(s, 3) for s in sent]}")


if __name__ == "__main__":
    main()
