"""Curation-operator tests: connected-components semantics, the loud
non-convergence guard on long chains, and the reliable-checkpoint mode
for cluster-durable runs (VERDICT r3 next-round #6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_chicago_crimes_spark.operators.curation import connected_components


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_connected_components_min_label(spark):
    """Two components + an isolated edge: every node labeled with the
    minimum reachable id."""
    edges = _edges(spark, [(1, 2), (2, 3), (10, 11), (3, 4)])
    got = {
        (r.id, r.component)
        for r in connected_components(edges).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_connected_components_long_chain_raises_loudly(spark):
    """A chain graph's diameter bounds the rounds min-label propagation
    needs; when max_iter is below that, the operator must RAISE (never
    return a silently-unconverged labeling)."""
    chain = _edges(spark, [(i, i + 1) for i in range(12)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=3)
    # and with enough rounds the same chain collapses to component 0
    labels = connected_components(chain, max_iter=15).collect()
    assert {r.component for r in labels} == {0}
    assert len(labels) == 13


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir switches the per-round lineage cut from
    executor-local localCheckpoint to reliable DataFrame.checkpoint():
    same labeling, and the checkpoint directory actually receives RDD
    checkpoint data (proving the durable path was taken)."""
    ckpt = str(tmp_path / "cc_ckpt")
    edges = _edges(spark, [(1, 2), (2, 3), (7, 8)])
    got = {
        (r.id, r.component)
        for r in connected_components(edges, checkpoint_dir=ckpt).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)}
    ckpt_files = list((tmp_path / "cc_ckpt").rglob("*"))
    assert ckpt_files, "reliable checkpoint dir is empty — durable path not taken"
