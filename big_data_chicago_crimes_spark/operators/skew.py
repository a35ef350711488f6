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

    The salt must NOT be a pure function of row content: the common skew
    case is a hot key whose rows are IDENTICAL (log lines, default
    values), and content-hash salting would send them all to one bucket,
    defeating the whole operator. Instead the salt round-robins on
    ``monotonically_increasing_id()`` — per-partition positional, so
    identical rows spread evenly over all ``buckets``. Deterministic for
    a fixed input partitioning (enough for a single job run; the salt
    never leaks into the output, so retries of downstream stages are
    unaffected). Result ≡ ``fact.join(dim, key, how)``; the dim
    replication costs buckets× its (small) size, bought back by even
    reducer load."""
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(buckets)).cast("int")
    )
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return salted_fact.join(replicated_dim, [key, "__salt"], how).drop("__salt")
