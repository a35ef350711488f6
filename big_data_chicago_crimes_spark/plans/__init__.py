"""Plan layer: the named-query registry and plan-inspection helpers."""

from big_data_chicago_crimes_spark.plans.registry import (
    REGISTRY,
    Query,
    all_queries,
    get_query,
    register,
)

__all__ = ["REGISTRY", "Query", "all_queries", "get_query", "register"]
