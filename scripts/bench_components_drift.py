"""VERDICT r16 task #7: attribute the docs_dedup_components sf1 scale
drift (2.17x at r16, up from borderline-2.0x at r15) BEFORE it earns an
adjudication by inertia.

Design: ONE session, interleaved A/B (immune to the slow-drift ambient
mode), 3 passes per tier in A-B-A-B order with the bench sentinel
(events_count_by_type at sf0.1) timed between passes so an ambient
burst is visible in the series rather than silently attributed to the
query. The sf1 pass additionally decomposes into

- edge generation (token_jaccard_pairs -> count, cached),
- propagation (connected_components over the cached edges, with the
  per-round frontier-size series),

so the ratio decomposes into "candidate-pair volume grew" vs
"propagation rounds/frontier grew" vs "ambient" — the three competing
explanations the verdict names.

Run (idle machine only): python scripts/bench_components_drift.py
Writes one JSON line to stdout; paste the stamp into
BENCH_ATTRIBUTION_r17.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from big_data_chicago_crimes_spark.operators.curation import connected_components
from big_data_chicago_crimes_spark.operators.dedup import token_jaccard_pairs
from big_data_chicago_crimes_spark.plans.registry import get_query
from big_data_chicago_crimes_spark.session import (
    get_spark,
    release_scratch_caches,
)
from big_data_chicago_crimes_spark.sources.readers import load_tables

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = os.path.join(REPO, ".scale", "sf1")


def main() -> None:
    if not os.path.isdir(SF1):
        print(
            json.dumps({"error": f"{SF1} missing — run scale_bench.py --gen-only"})
        )
        return
    spark = get_spark(app_name="components-drift", shuffle_partitions=32)
    q = get_query("docs_dedup_components")
    sentinel = get_query("events_count_by_type")

    def timed(build, sf):
        t0 = time.time()
        build(spark, sf).count()
        w = time.time() - t0
        release_scratch_caches()
        return round(w, 3)

    # warm both parquet footers / JVM paths once, untimed
    timed(q.build, SF01)
    sentinels = [timed(sentinel.build, SF01)]
    walls = {"sf0.1": [], "sf1": []}
    for _ in range(3):
        walls["sf0.1"].append(timed(q.build, SF01))
        sentinels.append(timed(sentinel.build, SF01))
        walls["sf1"].append(timed(q.build, SF1))
        sentinels.append(timed(sentinel.build, SF01))

    # decomposition at both tiers: edges vs propagation
    decomp = {}
    for tier, sf in (("sf0.1", SF01), ("sf1", SF1)):
        t = load_tables(spark, sf)
        edges = token_jaccard_pairs(
            t.documents, ["lang", "source"], threshold=0.5
        ).cache()
        t0 = time.time()
        n_edges = edges.count()
        edge_wall = time.time() - t0
        sizes: list[int] = []
        t0 = time.time()
        n_nodes = connected_components(
            edges, edges_canonical=True, round_sizes=sizes
        ).count()
        prop_wall = time.time() - t0
        edges.unpersist()
        decomp[tier] = {
            "n_edges": n_edges,
            "n_labeled_nodes": n_nodes,
            "edge_gen_s": round(edge_wall, 3),
            "propagation_s": round(prop_wall, 3),
            "round_sizes": sizes,
        }

    lo = min(walls["sf0.1"])
    hi = min(walls["sf1"])
    print(
        json.dumps(
            {
                "walls": walls,
                "sentinels_s": sentinels,
                "ratio_min": round(hi / lo, 3),
                "decomp": decomp,
            }
        )
    )


if __name__ == "__main__":
    main()
