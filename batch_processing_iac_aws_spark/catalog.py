"""Table loading and temp-view bootstrap for the test datasets.

The reference provisions its "catalog" (S3 buckets + a Glue job pointing at
them) with idempotent exists-check-then-create calls
(reference: batch_processing_IaC.py:45-567). The Spark-native analogue is an
idempotent :func:`ensure_views` that registers every dataset as a temp view
so both the DataFrame and ``spark.sql`` entry points work over the same data.

``events.parquet`` is written with TIMESTAMP(NANOS), which Spark's parquet
reader rejects outright; with ``spark.sql.legacy.parquet.nanosAsLong`` we read
the raw INT64 nanoseconds and truncate to microseconds here. Truncation (not
rounding) matches DuckDB's ns->us behavior, which the correctness oracle
relies on.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .session import apply_runtime_conf

#: All driver-generated tables (TESTDATA.md).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Columns stored as TIMESTAMP(NANOS) that arrive as INT64 nanoseconds.
_NANO_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}

#: Small dimension tables that should always be broadcast in joins.
BROADCAST_TABLES: frozenset[str] = frozenset(
    {"region", "nation", "supplier", "part", "customer"}
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table with normalized types.

    - nanosecond timestamp columns -> TIMESTAMP_NTZ truncated to micros
      (integer ``div 1000``: double math would lose precision at 1e18 ns)
    - everything else as stored (ms/us timestamps read as TIMESTAMP_NTZ)
    """
    apply_runtime_conf(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    for col in _NANO_TS_COLS.get(name, ()):
        if col in df.columns:
            df = df.withColumn(
                col,
                F.timestamp_micros(F.expr(f"`{col}` div 1000")).cast(
                    "timestamp_ntz"
                ),
            )
    return df


def ensure_views(spark: SparkSession, sf_dir: str) -> None:
    """Idempotently register every test table as a temp view.

    Spark-native replacement for the reference's provisioning script
    (batch_processing_IaC.py:571-715): re-running converges, nothing is
    duplicated, and downstream code can use ``spark.sql`` freely.
    """
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
