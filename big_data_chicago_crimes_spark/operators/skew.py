"""Skew-mitigation operators.

AQE's skew-join splitting (on by default in session.py) handles most
cases at runtime; ``salted_join`` is the explicit form for joins AQE
can't split (e.g. a broadcast-ineligible dimension hit by one hot key):
the fact side gets a deterministic salt, the dimension is replicated
once per salt bucket, and the join key becomes (key, salt) — the hot
key's rows spread over ``buckets`` reducers instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` with the fact side salted into ``buckets``.
    Salt is a deterministic hash of the whole fact row (uniform, stable
    across runs — no rand(), which would break retry determinism).
    Result ≡ ``fact.join(dim, key, how)``; the dim replication costs
    buckets× its (small) size, bought back by even reducer load."""
    fact_cols = [F.col(c) for c in fact.columns]
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*fact_cols), F.lit(buckets)).cast("int")
    )
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return salted_fact.join(replicated_dim, [key, "__salt"], how).drop("__salt")
