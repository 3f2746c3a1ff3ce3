"""fordgobike_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference repo Mostafa-Elnagar/FordGoBike-data-pipeline
(an Airflow + Postgres medallion ETL, see /root/reference), re-expressed as
declarative DataFrame plans optimized by Catalyst/AQE, plus the
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing) a 100 TB pipeline needs.

Layout:
  session    — SparkSession factory tuned for local[32] dev & cluster scale
  schemas    — explicit StructTypes (schema-on-write, no inferSchema)
  io         — readers, idempotent publish, high-water-mark incremental state
  functions/ — scalar expression library (SURVEY.md §2.6 F1–F19)
  operators/ — dedup, similarity, text, multimodal, join patterns
  plans/     — bronze/silver/gold pipeline stages (SURVEY.md §3)
  sources/   — CSV landing-dir source, rate-limited geocode enrichment
  streaming/ — incremental / structured-streaming upgrades (SURVEY.md §2.8)
"""

__version__ = "0.1.0"
