"""acled_spark — a PySpark-native analytics engine.

A from-scratch reimplementation of the query and data-processing
capabilities of the reference pipeline (``Stefan-Bojilov/acled``),
re-expressed Spark-first: DataFrame/SQL plans optimized by Catalyst,
partition-aware storage, Structured Streaming incrementality, and
MLlib feature/training pipelines.  See ``SURVEY.md`` at the repo root
for the operator inventory this package implements.

Layout:
    session.py    SparkSession factory tuned for local tests and cluster scale
    tables.py     testdata loaders + parity normalization
    registry.py   query registry: name -> (Spark builder, DuckDB oracle SQL)
    filters.py    column-filter predicate DSL (reference's 31-column filter API)
    queries/      the operator library (aggregations, windows, joins, dedup,
                  similarity, text analysis, ...)
    silver.py     idempotent keyed upsert (merge) semantics
    checks/       data-quality validation suite + YAML-driven factory
    streaming.py  incremental / Structured Streaming surface
    ml/           feature encoding, training, scoring (MLlib)
"""

__version__ = "0.1.0"
