"""One-off measurement: bloom prefilter at production sizing (12 bits/key,
prebuilt packed filter) on a mostly-new batch against the sf1 corpus index.

Backs the BENCH_SCALE_r10.md row and the DEPLOYMENT.md claim that with a
MATERIALIZED filter the exact anti-join input collapses to the hit
fraction. Run: python scripts/bench_bloom_sizing.py
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from big_data_chicago_crimes_spark.session import get_spark
from big_data_chicago_crimes_spark.operators.dedup import (
    bloom_index,
    bloom_index_packed,
    bloom_membership_flags_packed,
    doc_fingerprint,
    incremental_dedup_with_bloom,
    incremental_exact_dedup,
)

SF1 = os.path.join(REPO, ".scale", "sf1")

spark = get_spark(app_name="bloom-sizing", shuffle_partitions=32)
docs = spark.read.parquet(os.path.join(SF1, "documents.parquet"))

# Corpus index = fingerprints of every sf1 doc (the steady-state index).
corpus = docs.select(
    doc_fingerprint("text").alias("fingerprint")
).distinct().cache()
n_index = corpus.count()

# Batch: 10k docs, 90% NEW (salted texts the corpus has never seen),
# 10% members — the steady-state mostly-new crawl.
base = docs.orderBy("doc_id").limit(10_000)
batch = (
    base.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 0, F.col("text")  # 10% members
        ).otherwise(F.concat(F.col("text"), F.lit(" novel_r10_"), F.col("doc_id"))),
    )
    .select("doc_id", "text")
    .cache()
)
batch.count()

probe = batch.select(doc_fingerprint("text").alias("fingerprint")).distinct().cache()
n_probe = probe.count()
members = probe.join(corpus, "fingerprint", "left_semi").count()

# Prebuilt filters (materialized next to the index in production; build
# cost amortized over every batch, so timed separately and excluded).
t0 = time.time()
packed12 = bloom_index_packed(corpus, bits_per_key=12).cache()
packed12.count()
t_build12 = time.time() - t0

flags12 = bloom_membership_flags_packed(probe, packed12)
hits12 = flags12.filter("bloom_hit").count()

packed16 = bloom_index_packed(corpus, bits_per_key=16).cache()
packed16.count()
hits16 = bloom_membership_flags_packed(probe, packed16).filter("bloom_hit").count()

def timed(fn, reps=3):
    walls = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        walls.append(time.time() - t0)
    return min(walls)

# Warm
incremental_exact_dedup(batch, corpus, text_col="text").count()

w_exact = timed(lambda: incremental_exact_dedup(batch, corpus, text_col="text").count())
w_inline4 = timed(
    lambda: incremental_dedup_with_bloom(batch, corpus, text_col="text", bits_per_key=4).count()
)
w_pre12 = timed(
    lambda: incremental_dedup_with_bloom(batch, corpus, text_col="text", bloom=packed12).count()
)

out = {
    "index_keys": n_index,
    "batch_keys": n_probe,
    "batch_members": members,
    "bloom_12bpk_hits": hits12,
    "bloom_16bpk_hits": hits16,
    "fp_rate_12bpk": (hits12 - members) / max(1, n_probe - members),
    "fp_rate_16bpk": (hits16 - members) / max(1, n_probe - members),
    "packed12_build_s": round(t_build12, 3),
    "wall_exact_s": round(w_exact, 3),
    "wall_inline_rebuild_4bpk_s": round(w_inline4, 3),
    "wall_prebuilt_packed_12bpk_s": round(w_pre12, 3),
}
print(json.dumps(out, indent=2))
