"""One-off measurement: frontier-pruned vs full-relabel min-label
propagation on the ORGANIC sf1 dedup graph (VERDICT r10 task #5 —
docs_dedup_components is the suite's slowest query, 33 s at sf1).

Interleaved within one session (immune to the environment drift mode):
  OLD — every round joins the adjacency against the FULL labeling and
        detects convergence with a limit(1) count over new labels
        (the shipped form through r10);
  NEW — every round joins the adjacency against only the CHANGED
        labels (the frontier), convergence = frontier count == 0
        (shipped r11; operators/curation.py:connected_components).

Also reports the per-round frontier-size series (the new round_sizes
stamp) so the cost decomposes into rounds x per-round join volume, and
label-set equality between both forms. Edge generation is cached OUT
of the timed region — the A/B isolates the propagation loop, then the
full uncached query wall is reported once for the headline context.
Run: python scripts/bench_components_frontier.py [sf_dir]
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from big_data_chicago_crimes_spark.operators.curation import (
    _lineage_cut,
    connected_components,
)
from big_data_chicago_crimes_spark.operators.dedup import token_jaccard_pairs
from big_data_chicago_crimes_spark.session import get_spark
from big_data_chicago_crimes_spark.sources.readers import load_tables

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1"

spark = get_spark(app_name="components-frontier", shuffle_partitions=32)


def connected_components_unpruned(edges, src="id_a", dst="id_b", max_iter=30):
    """The r10-shipped loop, verbatim shape: full-label join per round,
    limit(1) convergence probe."""
    cut = _lineage_cut(edges, False)
    sym = edges.select(F.col(src).alias("id"), F.col(dst).alias("nbr")).union(
        edges.select(F.col(dst).alias("id"), F.col(src).alias("nbr"))
    )
    sym = cut(sym)
    labels = (
        sym.groupBy("id")
        .agg(F.min("nbr").alias("__mn"))
        .select("id", F.least(F.col("id"), F.col("__mn")).alias("component"))
    )
    labels = cut(labels)
    for _ in range(max_iter):
        nbr_min = (
            sym.alias("s")
            .join(labels.alias("l"), F.col("s.nbr") == F.col("l.id"))
            .select(
                F.col("s.id").alias("id"),
                F.col("l.component").alias("nbr_component"),
            )
            .groupBy("id")
            .agg(F.min("nbr_component").alias("nbr_component"))
        )
        new_labels = labels.join(nbr_min, "id", "left").select(
            "id",
            F.least(
                F.col("component"), F.coalesce("nbr_component", "component")
            ).alias("component"),
            (F.col("nbr_component") < F.col("component")).alias("__changed"),
        )
        new_labels = cut(new_labels)
        changed = new_labels.filter(F.col("__changed")).limit(1).count()
        labels = new_labels.drop("__changed")
        if changed == 0:
            return labels
    raise RuntimeError("unpruned variant did not converge")


t = load_tables(spark, SF_DIR)
edges = token_jaccard_pairs(t.documents, ["lang", "source"], threshold=0.5).cache()
n_edges = edges.count()

# equality first
old_lab = {
    (r.id, r.component) for r in connected_components_unpruned(edges).collect()
}
sizes = []
new_lab = {
    (r.id, r.component)
    for r in connected_components(
        edges, edges_canonical=True, round_sizes=sizes
    ).collect()
}
assert old_lab == new_lab, "frontier pruning changed the labeling!"

walls_old, walls_new = [], []
for _ in range(3):
    t0 = time.time()
    connected_components_unpruned(edges).count()
    walls_old.append(time.time() - t0)
    t0 = time.time()
    connected_components(edges, edges_canonical=True).count()
    walls_new.append(time.time() - t0)

# headline context: the full query, uncached edges, new form
from big_data_chicago_crimes_spark.plans.registry import get_query

q = get_query("docs_dedup_components")
t0 = time.time()
q.build(spark, SF_DIR).count()
full_wall = time.time() - t0

print(
    json.dumps(
        {
            "sf_dir": SF_DIR,
            "n_edges": n_edges,
            "n_labeled_nodes": len(new_lab),
            "round_sizes": sizes,
            "propagation_old_s": round(min(walls_old), 3),
            "propagation_new_s": round(min(walls_new), 3),
            "walls_old": [round(w, 3) for w in walls_old],
            "walls_new": [round(w, 3) for w in walls_new],
            "full_query_new_s": round(full_wall, 3),
            "labels_equal": True,
        },
        indent=2,
    )
)
