"""Vector math over array<float|double> columns — pure Spark expressions.

Used by the similarity-search and embedding-dedup operators. The dot
products and norms use higher-order ``zip_with``/``aggregate``: Spark
evaluates HOF lambdas per element in interpreted mode, but as a tight
loop over the array — measured FASTER than unrolling a 64-dim product
into ~200 codegen'd expression nodes (a 16-plane × 64-dim unrolled LSH
signature was 5× slower: giant expression trees fall out of JIT/codegen
budgets). The scalable levers are instead:

- ``cosine_similarity_to_literal``: the query-side norm of a constant
  vector is a driver-side Python double — half the per-row aggregates
  on a scan against a fixed query.
- Precompute ``l2_norm`` per ROW before a pair join (see
  operators.dedup.embedding_near_dups): each pair then costs one dot
  product, not one dot plus two norms.

No UDFs anywhere; everything runs JVM-side with zero serialization.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (double precision).

    NOTE length-mismatched inputs return NULL, not an error: zip_with
    pads the shorter array with nulls and the fold propagates them —
    mismatched rows then silently drop out of any sim-threshold filter.
    Validate dimensions upstream when corruption is possible (the
    vectorized kernels' _vectors_matrix guard is the loud variant).
    """
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    v = _c(a)
    return F.sqrt(
        F.aggregate(
            v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def literal_l2_norm(q: list[float]) -> float:
    """Driver-side ‖q‖ with the same left-fold float semantics as the
    column form (Python floats are IEEE doubles), so literal-query and
    column-query cosines agree bit-for-bit."""
    acc = 0.0
    for x in q:
        acc += float(x) * float(x)
    return math.sqrt(acc)


def cosine_similarity(
    a: Column | str,
    b: Column | str,
    norm_a: Column | None = None,
    norm_b: Column | None = None,
) -> Column:
    """cos(a,b) ∈ [-1,1]; 0.0 when either vector is all-zero. Pass
    precomputed ``norm_a``/``norm_b`` (e.g. computed once per row before
    a pair join) to skip the per-pair norm aggregates."""
    denom = (norm_a if norm_a is not None else l2_norm(a)) * (
        norm_b if norm_b is not None else l2_norm(b)
    )
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def cosine_similarity_to_literal(a: Column | str, q: list[float]) -> Column:
    """cos(a, q) for a constant query vector: the q-side norm folds to a
    Python double, so the scan side runs two aggregates per row (dot and
    own norm) instead of three."""
    q_arr = F.array(*[F.lit(float(x)) for x in q])
    denom = l2_norm(a) * F.lit(literal_l2_norm(q))
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, q_arr) / denom)
