"""batch_processing_iac_aws_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the data-processing capabilities of
``maximkiesel1/batch_processing_IaC_AWS`` (see SURVEY.md), extended with the
full relational operator surface (joins, aggregations, windows, set ops,
scalar functions), structured-streaming incrementality, and LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Layout:
  session.py        SparkSession factory + scale-oriented runtime defaults
  catalog.py        table loading / temp-view bootstrap over the test datasets
  io.py             explicit-schema readers and idempotent partitioned writers
  reference_job.py  the reference's whole pipeline as one call + run_pipeline
  sources/          file discovery, latest-partition selection, landing utils
  operators/        timeseries (reference parity), joins, dedup, similarity,
                    text, multimodal, skew salting, distributed ranking
  functions/        vector math and scalar helpers
  plans/            the query registry (queries() + oracle_sql() twins)
  streaming/        incremental file pipeline, stateful ops, windowed aggs
"""

from .catalog import ensure_views, load_table
from .io import read_csv, read_json, read_parquet, write_parquet
from .operators.timeseries import expand_intervals, intervals_from_events
from .reference_job import run_pipeline, run_reference_job
from .session import get_spark

__version__ = "0.1.0"

__all__ = [
    "ensure_views",
    "expand_intervals",
    "get_spark",
    "intervals_from_events",
    "load_table",
    "read_csv",
    "read_json",
    "read_parquet",
    "run_pipeline",
    "run_reference_job",
    "write_parquet",
    "__version__",
]
