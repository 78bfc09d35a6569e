"""deloton_solo_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``Eros-code/deloton-solo`` (a Kafka →
parse/sessionize → Postgres ETL plus a Flask analytics API), extended with
the operators a large-scale LLM training-data pipeline needs (dedup,
similarity search, text analysis, multimodal columns).

Design (see SURVEY.md):
- DataFrame / Spark SQL only; no RDDs; zero row-at-a-time Python UDFs in
  hot paths (Pandas UDFs via mapInPandas only where built-ins can't express
  the semantics, e.g. multimodal decode plumbing).
- Everything declarative so Catalyst does pushdown / pruning / join
  selection; broadcast hints for dimension tables; AQE-friendly.
- Each public query has a DuckDB-runnable ANSI-SQL oracle twin for
  correctness checking (driver contract in ``__spark_entry__.py``).
"""

__version__ = "0.1.0"
