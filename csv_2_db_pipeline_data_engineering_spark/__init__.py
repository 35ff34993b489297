"""PySpark-native analytics/ETL engine.

A ground-up Spark rebuild of the capabilities of the reference pipeline
(Maxwell-Selassie/csv_2_db_pipeline-Data-Engineering): CSV ingest with
encoding fallback, structural validation, typed transform, business-rule
validation with a dead-letter split, and idempotent keyed upsert — plus a
general analytics surface (joins, aggregations, windows, set ops) and
LLM-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal columns), all expressed as lazy DataFrame plans that Catalyst
optimizes and that scale horizontally.

Design rules (enforced throughout):
- DataFrame/SQL built-ins only in hot paths; zero row-at-a-time Python.
- All casts/parses use ``try_``-variants so behavior is identical whether
  ``spark.sql.ansi.enabled`` is true (Spark 4 default) or false.
- No ``collect()`` inside operators; everything stays distributed.
"""

__version__ = "0.1.0"
