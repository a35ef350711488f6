"""SQL surface: spark.sql over registered views produces the same result
as the DataFrame builder (Catalyst parity between the two frontends)."""

from __future__ import annotations

from big_data_chicago_crimes_spark.plans.registry import all_queries
from big_data_chicago_crimes_spark.sql import register_views, sql


def test_register_views_lists_all(spark, sf_dir):
    names = register_views(spark, sf_dir)
    assert len(names) == 10
    assert spark.sql("SELECT COUNT(*) AS n FROM lineitem").collect()[0].n > 0


def test_sql_matches_dataframe_builder(spark, sf_dir):
    df_result = all_queries()["events_count_by_type"].build(spark, sf_dir).collect()
    sql_result = sql(
        spark,
        sf_dir,
        """SELECT event_type, COUNT(*) AS cnt FROM events
           GROUP BY event_type ORDER BY cnt DESC, event_type""",
    ).collect()
    assert [tuple(r) for r in df_result] == [tuple(r) for r in sql_result]
