"""One-off measurement: shared_span_pairs at WEB-LIKE k-gram collision
rates (VERDICT r9 task #8 / BENCH_SCALE_r10.md).

The driver fixture's 40-token vocabulary makes k-gram hash collisions
~250x denser than web text, inflating the candidate stage and the
stamped 7.5x sf1 ratio. This script synthesizes a wide-vocabulary
corpus (100k distinct tokens, same ~300-char doc shape) with planted
span twins (doc 50j+1 copies its first 80 chars from doc 50j — the
answer grows LINEARLY with the corpus), runs the operator at n=5,000
(sf0.1 scale) and n=50,000 (10x), and reports walls + candidate-stage
cardinalities. Run: python scripts/bench_span_realism.py
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from big_data_chicago_crimes_spark.session import get_spark
from big_data_chicago_crimes_spark.operators.dedup import shared_span_pairs

spark = get_spark(app_name="span-realism", shuffle_partitions=32)


def make_corpus(n: int):
    """n docs, ~45 tokens each drawn i.i.d. from a 100k-token space
    (tokens are position-and-doc-hashed, so organic long shared spans
    are vanishingly rare — the web-text regime); every doc 50j+1
    then has its first 80 chars overwritten by doc 50j's, planting
    exactly one >=50-char shared span per (50j, 50j+1) pair."""
    base = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(45)),
                    lambda p: F.concat(
                        F.lit("w"),
                        F.pmod(F.xxhash64(F.col("id"), p), F.lit(100_000)),
                    ),
                ),
            ).alias("text"),
        )
    )
    donors = base.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 1).alias("doc_id"),
        F.substring("text", 1, 80).alias("__plant"),
    )
    return (
        base.join(donors, "doc_id", "left")
        .select(
            "doc_id",
            F.when(
                F.col("__plant").isNotNull(),
                F.concat(F.col("__plant"), F.substring("text", 81, 10_000)),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .cache()
    )


def timed(fn, reps=3):
    walls = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        walls.append(time.time() - t0)
    return min(walls)


out = {"vocab": 100_000, "planted_pair_per": 50}
for n in (5_000, 50_000):
    corpus = make_corpus(n)
    corpus.count()
    res = shared_span_pairs(corpus, min_span=50, k=28)
    rows = res.count()  # warm
    wall = timed(lambda: shared_span_pairs(corpus, min_span=50, k=28).count())
    out[f"n{n}"] = {"pairs": rows, "wall_s": round(wall, 3)}
    corpus.unpersist()

out["ratio_10x"] = round(out["n50000"]["wall_s"] / out["n5000"]["wall_s"], 2)
out["answer_growth"] = round(out["n50000"]["pairs"] / max(1, out["n5000"]["pairs"]), 2)
print(json.dumps(out, indent=2))
