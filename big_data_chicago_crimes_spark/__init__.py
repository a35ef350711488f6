"""big_data_chicago_crimes_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference application ``gaianicolazzo/Big-Data-Chicago-Crimes``
(a single-module PySpark + Streamlit crime-analytics app; see
``/root/reference/src/modules/Dataset.py``), extended with the operators a
large-scale training-data pipeline needs (dedup, similarity search, text
analysis, multimodal plumbing, streaming).

Design principles (100 TB posture):

- DataFrame/SQL only — Catalyst owns optimization (predicate pushdown,
  column pruning, join selection, AQE re-planning).
- No ``collect()``/``toPandas()`` inside operators; everything is a
  DataFrame → DataFrame transform.
- Explicit schemas, partitioned Parquet, broadcast hints for dim tables.
- Python stays out of the hot path; where unavoidable, Arrow-batched
  Pandas UDFs / ``mapInPandas`` — never row-at-a-time UDFs.
"""

from big_data_chicago_crimes_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
