"""The scaling-evidence generator itself must be tested: untested
generators produce untrusted evidence (VERDICT r5 #7).

Builds the derived 2× corpus from sf0.001 into a tmp dir via the SAME
``build_scale_data`` the sf1 run uses, then pins the properties the
scaling argument rests on:

- row counts scale by exactly ``replicas`` for facts, 1× for dims;
- dup-cluster STRUCTURE is replicated, not inflated: the histogram of
  exact-duplicate cluster sizes doubles in count per size (clusters grow
  in number, never in size — the organic-growth invariant that keeps
  candidate-pair counts linear);
- the bijective token rename keeps replicas disjoint: no text collides
  across replicas;
- embedding sign-flips preserve norms exactly (so within-replica cosine
  structure is untouched) while decorrelating replicas.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from scale_bench import _OFFSET, build_scale_data


@pytest.fixture(scope="module")
def scale_dir(spark, sf_dir, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("scale") / "sf2x")
    build_scale_data(spark, src=sf_dir, dst=dst, replicas=2)
    return dst


def _load(spark, d, name):
    from big_data_chicago_crimes_spark.sources.readers import load_table

    return load_table(spark, d, name)


def test_fact_tables_scale_by_replicas(spark, sf_dir, scale_dir):
    for name in ("documents", "embeddings", "events", "orders", "lineitem"):
        src_n = _load(spark, sf_dir, name).count()
        dst_n = _load(spark, scale_dir, name).count()
        assert dst_n == 2 * src_n, f"{name}: {dst_n} != 2×{src_n}"


def test_dim_tables_copied_verbatim(spark, sf_dir, scale_dir):
    for name in ("region", "nation", "customer", "supplier", "part"):
        src_n = _load(spark, sf_dir, name).count()
        dst_n = _load(spark, scale_dir, name).count()
        assert dst_n == src_n, f"{name}: dim must not grow"


def test_dup_cluster_histogram_replicates(spark, sf_dir, scale_dir):
    """cluster-size → #clusters histogram must scale in COUNT (×replicas)
    with the sizes themselves unchanged. If cross-replica texts collided,
    sizes would grow instead and candidate pairs would go quadratic."""

    def histogram(d):
        rows = (
            _load(spark, d, "documents")
            .groupBy("text")
            .count()
            .groupBy("count")
            .agg(F.count("*").alias("n_clusters"))
            .collect()
        )
        return {r["count"]: r["n_clusters"] for r in rows}

    src_h, dst_h = histogram(sf_dir), histogram(scale_dir)
    assert dst_h == {size: 2 * n for size, n in src_h.items()}


def test_replica_texts_disjoint(spark, scale_dir):
    """The rename is bijective per replica, so replica 0 and replica 1
    share zero texts — cross-replica similarity genuinely collapses."""
    docs = _load(spark, scale_dir, "documents")
    r0 = docs.filter(F.col("doc_id") < _OFFSET).select("text")
    r1 = docs.filter(F.col("doc_id") >= _OFFSET).select("text")
    assert r0.intersect(r1).count() == 0


def test_embedding_sign_flip_preserves_norms(spark, sf_dir, scale_dir):
    """Replica k's vector is the source vector with a seeded ± mask:
    identical L2 norm, coordinate-wise |x| equal."""
    norm = F.sqrt(
        F.aggregate("embedding", F.lit(0.0), lambda acc, x: acc + x * x)
    ).alias("norm")
    src = {
        r["vec_id"]: r["norm"]
        for r in _load(spark, sf_dir, "embeddings").select("vec_id", norm).collect()
    }
    derived = {
        r["vec_id"]: r["norm"]
        for r in _load(spark, scale_dir, "embeddings")
        .filter(F.col("vec_id") >= _OFFSET)
        .select("vec_id", norm)
        .collect()
    }
    assert len(derived) == len(src)
    for vid, n in src.items():
        assert math.isclose(derived[vid + _OFFSET], n, rel_tol=1e-5), vid


def test_replica_embeddings_not_identical(spark, sf_dir, scale_dir):
    """The mask must actually flip something, or 'near-dup' clusters
    would silently double in size instead of count."""
    emb = _load(spark, scale_dir, "embeddings")
    joined = (
        emb.filter(F.col("vec_id") < _OFFSET)
        .alias("a")
        .join(
            emb.filter(F.col("vec_id") >= _OFFSET)
            .withColumn("vec_id", F.col("vec_id") - _OFFSET)
            .alias("b"),
            "vec_id",
        )
        .select(
            (F.col("a.embedding") == F.col("b.embedding")).alias("same")
        )
    )
    assert joined.filter("same").count() == 0
