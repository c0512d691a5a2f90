"""batch_processing_iac_aws_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the data-processing capabilities of
``maximkiesel1/batch_processing_IaC_AWS`` (see SURVEY.md), extended with the
full relational operator surface (joins, aggregations, windows, set ops,
scalar functions), structured-streaming incrementality, and LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Layout:
  session.py    SparkSession factory + scale-oriented runtime defaults
  catalog.py    table loading / temp-view bootstrap over the test datasets
  io.py         explicit-schema readers and idempotent partitioned writers
  sources/      file discovery, latest-partition selection, landing utilities
  operators/    timeseries (reference parity), joins, dedup, similarity, text,
                multimodal
  functions/    vector math and scalar helpers
  plans/        the query registry (queries() + oracle_sql() twins)
  streaming/    incremental file pipeline, windowed/session aggregation
"""

__version__ = "0.1.0"
