"""Interleaved A/B: docs_domain_quota's shared corpus-LM fit vs private
per-leg fits (VERDICT r11 #7 — re-stamp the cost anchor's load-bearing
decision with an interleaved measurement; the r11 number was isolated).

A-arm = the SHIPPED builder (one shared ``fit_unigram_lm``, NOT
persisted — the r12 three-arm interleaved A/B measured the scratch
persist's fill costing more than the duplicated fit subplans at both
tiers and the persist was removed; this script now re-stamps shared
NO-persist vs private fits). B-arm = the same three legs with each LM
consumer refitting internally (``lm=None`` / ``source_lm=None``) — the
shape the shared fit replaced. Arms alternate per pass so environment
drift hits both equally; a sentinel run brackets the series.

Usage: python scripts/bench_quota_shared_fit.py [sf_dir] [passes]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _private_fit_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """docs_domain_quota's three legs with PRIVATE per-leg LM fits —
    the pre-r11 shape the shared fit replaced. Kept structurally
    identical to the registered builder otherwise."""
    from big_data_chicago_crimes_spark.operators.curation import (
        dsir_logratio,
        unigram_logprob,
    )
    from big_data_chicago_crimes_spark.operators.sampling import (
        quota_sample,
        score_ntile,
    )
    from big_data_chicago_crimes_spark.sources.readers import load_tables

    t = load_tables(spark, sf_dir)
    kept = quota_sample(t.documents, ["source"], n=10, key="doc_id")
    quota = kept.select(F.lit("quota").alias("leg"), "doc_id", "source")
    target = t.documents.filter(F.col("source") == "src0")
    dsir = (
        dsir_logratio(t.documents, target, source_lm=None)  # private fit
        .orderBy(F.col("dsir_score").desc(), "doc_id")
        .limit(200)
        .join(t.documents.select("doc_id", "source"), "doc_id")
        .select(F.lit("dsir_top200").alias("leg"), "doc_id", "source")
    )
    scored = unigram_logprob(t.documents, lm=None).join(  # private fit
        t.documents.select("doc_id", "lang", "source"), "doc_id"
    )
    ccnet = (
        score_ntile(scored, "avg_logprob", 3, ["lang"], "doc_id", ascending=False)
        .filter(F.col("tile") == 1)
        .select(F.lit("ccnet_head").alias("leg"), "doc_id", "source")
    )
    return quota.unionByName(dsir).unionByName(ccnet).orderBy("leg", "source", "doc_id")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from big_data_chicago_crimes_spark.plans.registry import all_queries
    from big_data_chicago_crimes_spark.session import (
        get_spark,
        release_scratch_caches,
    )

    spark = get_spark(app_name="bench-quota-shared-fit")
    qs = all_queries()
    shared = qs["docs_domain_quota"].build
    sentinel = qs["events_count_by_type"].build

    def run(build) -> float:
        t0 = time.perf_counter()
        build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        release_scratch_caches()
        return time.perf_counter() - t0

    # warm both arms once (JIT position-independence)
    run(shared)
    run(_private_fit_build)

    sent = [round(run(sentinel), 3)]
    a, b = [], []
    for _ in range(passes):
        a.append(round(run(shared), 3))
        b.append(round(run(_private_fit_build), 3))
        sent.append(round(run(sentinel), 3))

    # row-identity spot check: same legs, same rows
    na = shared(spark, sf_dir).count()
    nb = _private_fit_build(spark, sf_dir).count()

    print(f"sf_dir={sf_dir} passes={passes}")
    print(f"A shared-fit   : {a}  median={statistics.median(a):.3f}")
    print(f"B private-fits : {b}  median={statistics.median(b):.3f}")
    print(f"sentinel       : {sent}")
    print(f"rows A={na} B={nb} identical={na == nb}")


if __name__ == "__main__":
    main()
