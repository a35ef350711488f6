"""Named-query registry.

Every capability the engine claims (one per operator row in SURVEY.md §2
plus the training-data-pipeline extensions) is registered here as a
``Query``: a Spark builder ``(spark, sf_dir) -> DataFrame`` and, when the
semantics are SQL-expressible, an equivalent ANSI-SQL oracle that DuckDB
runs over the same parquet tables. The driver's correctness gate compares
the two (row count + schema + order-insensitive value hash), so:

- every computed column is aliased IDENTICALLY in builder and oracle;
- doubles are rounded in BOTH (floating-point sums are order-sensitive);
- derived integer date parts are INTEGER on both sides, counts BIGINT;
- timestamps are emitted as formatted strings (Spark µs vs DuckDB ns
  precision makes raw timestamp hashing fragile);
- top-k queries carry explicit tie-break columns.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    build: Builder
    oracle: str | None = None  # ANSI SQL for DuckDB; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[Builder], Builder]:
    """Decorator: register a query builder under ``name``."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(
            name=name, build=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "").strip()
        )
        return fn

    return deco


def _load_all() -> None:
    """Import every query module so registration side-effects run."""
    import big_data_chicago_crimes_spark.queries  # noqa: F401


def all_queries() -> dict[str, Query]:
    _load_all()
    return dict(REGISTRY)


def get_query(name: str) -> Query:
    _load_all()
    return REGISTRY[name]
