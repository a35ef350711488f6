#!/usr/bin/env python
"""Adjudicate the lineitem_rollup merge note (VERDICT r9 'what's wrong' #1).

The r9 merge folded the former lineitem_correlations (global Pearson
pairs) into lineitem_rollup's single ROLLUP aggregate, claiming "one
scan instead of two". At sf0.1 the merged form measured SLOWER than the
pair (0.546 s vs 0.452 s) because corr's co-moment state now updates at
every grouping level while the saved scan is nearly free at that size.

The question that matters for the 100 TB design: which form wins when
the scan is NOT free? This measures both forms at sf1 (10× lineitem,
the derived .scale corpus) — merged one-pass rollup-with-corr vs the
former pair (rollup-only agg + separate global-corr scan), median of 3
after warm-up, alternating order.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_data_chicago_crimes_spark.session import get_spark
from big_data_chicago_crimes_spark.sources.readers import load_tables

SF1 = "/root/repo/.scale/sf1"


def merged(spark, sf_dir):
    from big_data_chicago_crimes_spark.queries.olap_queries import lineitem_rollup

    return lineitem_rollup(spark, sf_dir)


def pair(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    roll = (
        t.lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )
    corrs = t.lineitem.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.corr("l_extendedprice", "l_discount"), 6).alias("corr_price_discount"),
        F.round(F.corr("l_quantity", "l_tax"), 6).alias("corr_qty_tax"),
    )
    return roll, corrs


def time_merged(spark):
    t0 = time.monotonic()
    merged(spark, SF1).collect()
    return time.monotonic() - t0


def time_pair(spark):
    t0 = time.monotonic()
    roll, corrs = pair(spark, SF1)
    roll.collect()
    corrs.collect()
    return time.monotonic() - t0


def main():
    spark = get_spark()
    # warm-up once each (page cache + codegen)
    time_merged(spark)
    time_pair(spark)
    m, p = [], []
    for _ in range(3):  # alternate to neutralize drift
        m.append(time_merged(spark))
        p.append(time_pair(spark))
    out = {
        "bench": "lineitem_rollup_merge_ab",
        "sf": 1.0,
        "merged_median_s": round(statistics.median(m), 3),
        "pair_median_s": round(statistics.median(p), 3),
        "merged_runs": [round(x, 3) for x in m],
        "pair_runs": [round(x, 3) for x in p],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
