"""stock_data_pipeline_spark — a PySpark-native analytics engine.

A ground-up re-expression of the capabilities of the reference repo
``justpqa/stock_data_pipeline`` (an Airflow/pandas ETL project, surveyed in
/root/repo/SURVEY.md) as an idiomatic Apache Spark engine:

- Tier A: the reference's literal pipeline surface (multi-source scheduled
  ingestion, sharded parallel fetch, union, schema-enforced append loading)
  → ``pipelines/`` + ``sources/``.
- Tier B: the relational query surface the reference delegates to BigQuery
  (filter/agg/join/window/rollup/...) → ``operators/relational.py``,
  ``operators/timeseries.py``.
- Tier C: large-scale training-data operators (dedup, similarity search,
  text analysis, multimodal columns) → ``operators/dedup.py``,
  ``operators/similarity.py``, ``operators/text.py``,
  ``operators/multimodal.py``.

Everything is DataFrame/SQL-first: the logical plan is declared through the
public PySpark API and optimized by Catalyst; Pandas UDFs are used only where
built-in operators cannot express the semantics (network fetch, binary decode).
"""

__version__ = "0.1.0"
