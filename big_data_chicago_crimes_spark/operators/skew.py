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


# Join types whose semantics survive dim-side replication: every fact row
# still matches exactly the dim rows it would have matched (same salt →
# same single replica), and no dim-side row ever surfaces unmatched. For
# right/full outer joins each UNMATCHED dim row would surface once per
# salt replica — `buckets` spurious null-extended rows — so they are
# rejected rather than silently duplicated.
_SALT_SAFE_HOW = frozenset(
    {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
     "left_anti", "leftanti"}
)


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
    identical rows spread evenly over all ``buckets``.

    Determinism constraint: ``monotonically_increasing_id`` depends on
    row order within partitions, so ``fact`` must be a deterministic
    scan (file read, cached table). If the fact side is itself a shuffle
    output with nondeterministic row order, a partial stage retry can
    reassign salts mid-join — materialize the fact side first in that
    case. The salt never leaks into the output, so downstream-stage
    retries are unaffected either way.

    ``how`` is restricted to fact-side-preserving joins (inner, left,
    left_semi, left_anti): for right/full outer joins every unmatched
    dim row would surface ``buckets`` times (one null-extended row per
    salt replica), silently duplicating results — use a plain join or
    swap the sides for those. Result ≡ ``fact.join(dim, key, how)``; the
    dim replication costs buckets× its (small) size, bought back by even
    reducer load."""
    if how.replace("_", "").lower() not in {h.replace("_", "") for h in _SALT_SAFE_HOW}:
        raise ValueError(
            f"salted_join(how={how!r}): only fact-side-preserving joins "
            "(inner/left/left_semi/left_anti) keep their semantics under "
            "dim replication; right/full outer would emit one null-extended "
            "row per salt replica for every unmatched dim row"
        )
    clash = sorted({"__salt"} & (set(fact.columns) | set(dim.columns)))
    if clash:
        raise ValueError(
            "salted_join: input columns collide with reserved '__salt' — "
            "it would be silently overwritten and then dropped"
        )
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(buckets)).cast("int")
    )
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return salted_fact.join(replicated_dim, [key, "__salt"], how).drop("__salt")
