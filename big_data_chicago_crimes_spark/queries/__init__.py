"""Query modules — importing this package registers every named query."""

from big_data_chicago_crimes_spark.queries import (  # noqa: F401
    asof_queries,
    curation_queries,
    dedup_queries,
    etl_queries,
    geo_queries,
    join_queries,
    layout_queries,
    ml_queries,
    multimodal_queries,
    olap_queries,
    reference_queries,
    sampling_queries,
    similarity_queries,
    text_queries,
    window_queries,
)
