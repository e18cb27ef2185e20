"""music_database_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the query and data-processing
capabilities of the reference project shreyasb27/Music-Database (a MySQL
schema + 6 analytical queries; see /root/reference/music_db.sql and
/root/reference/Queries), extended with the LLM-data-pipeline operator
surface (dedup, similarity search, text analysis, multimodal columns,
streaming) required for 100 TB-scale training-data work.

Layout:
  sources/    schemas, parquet loaders, fixture loaders
  plans/      declarative query builders (DataFrame/SQL) — the REF queries
  functions/  scalar/array/text expression helpers (JVM-side, codegen-able)
  operators/  composite operators (dedup, kNN, constraint validation, ...)
  streaming/  Structured Streaming forms of the windowed operators
  registry.py query registry consumed by __spark_entry__.py
"""

__version__ = "0.1.0"
