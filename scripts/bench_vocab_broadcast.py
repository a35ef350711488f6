#!/usr/bin/env python
"""Interleaved A/B: forced F.broadcast on vocabulary-sized LM-scorer
join sides vs letting AQE decide (VERDICT r13 #4).

The unigram/bigram scorers join corpus-sized token frames against
vocabulary-keyed count frames (vocab, c1, uni). The frames are
kilobytes at every bench tier — but vocabulary grows with the corpus
(web-scale: billions of tokens), so an unconditional hint is a driver
OOM at the 100 TB north star. The question this A/B answers is whether
the hint buys anything AQE's runtime conversion doesn't: arms alternate
per pass (A = hinted, B = AQE) by monkeypatching curation._vocab_side;
a sentinel run brackets the series.

Usage: python scripts/bench_vocab_broadcast.py [sf_dir] [passes]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_data_chicago_crimes_spark.operators import curation
from big_data_chicago_crimes_spark.operators.curation import (
    bigram_logprob,
    unigram_logprob,
)
from big_data_chicago_crimes_spark.session import get_spark
from big_data_chicago_crimes_spark.sources.readers import load_tables


def run_arm(spark, sf_dir, hinted):
    curation._vocab_side = (lambda v: F.broadcast(v)) if hinted else (lambda v: v)
    t = load_tables(spark, sf_dir)
    t0 = time.time()
    n1 = unigram_logprob(t.documents).count()
    t1 = time.time()
    n2 = bigram_logprob(t.documents).count()
    t2 = time.time()
    return (n1, n2), (t1 - t0, t2 - t1)


def sentinel(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    t0 = time.time()
    t.events.groupBy("event_type").count().collect()
    return time.time() - t0


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="vocab-bc-ab", shuffle_partitions=32)
    run_arm(spark, sf_dir, False)  # warm the scan/session
    uni = {True: [], False: []}
    bi = {True: [], False: []}
    sent = []
    rows = None
    for i in range(passes):
        sent.append(sentinel(spark, sf_dir))
        first = i % 2 == 0
        for hinted in ([True, False] if first else [False, True]):
            rows, (du, db) = run_arm(spark, sf_dir, hinted)
            uni[hinted].append(du)
            bi[hinted].append(db)
    sent.append(sentinel(spark, sf_dir))
    print(f"rows={rows} sf={sf_dir}")
    for name, d in [("unigram", uni), ("bigram", bi)]:
        a, b = min(d[True]), min(d[False])
        print(
            f"{name}: hinted={sorted(round(x, 3) for x in d[True])} "
            f"aqe={sorted(round(x, 3) for x in d[False])} "
            f"ratio(aqe/hinted)={b / a:.3f}"
        )
    print(f"sentinel: {[round(s, 3) for s in sent]}")


if __name__ == "__main__":
    main()
