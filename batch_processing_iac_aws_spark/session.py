"""SparkSession factory with scale-oriented defaults.

The reference builds its session with nothing but an appName
(reference: pyspark_skript/pyspark_script.py:12-14) and delegates every
physical decision to the engine. We keep that spirit — declare, let
Catalyst/AQE decide — but pin the handful of knobs that matter at scale:
AQE (runtime re-planning, skew-join splitting, partition coalescing),
a deterministic session timezone, and Arrow for any pandas interchange.

Two entry points:

* :func:`get_spark` — build a local session (tests, bench).
* :func:`apply_runtime_conf` — apply the runtime-settable subset to an
  EXISTING session (the verification driver owns its own session; every
  loader in :mod:`.catalog` calls this so behavior is identical).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Conf that is safe to set on a live session (spark.conf.set).
RUNTIME_CONF: dict[str, str] = {
    # Adaptive query execution: runtime shuffle-partition coalescing,
    # skew-join splitting, and dynamic broadcast selection. At 100 TB this
    # is the difference between a fixed shuffle width and one sized to the
    # actual post-filter data.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Deterministic timestamp rendering regardless of host TZ — required for
    # differential testing against DuckDB (naive timestamps).
    "spark.sql.session.timeZone": "UTC",
    # The driver-generated events.parquet stores TIMESTAMP(NANOS), which
    # Spark's parquet reader rejects; read it as raw INT64 nanos and convert
    # in catalog.load_table (ns -> us truncation, matching DuckDB).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Arrow-accelerated toPandas / pandas UDF transfer.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}

#: Conf that must be set before the JVM/session starts.
BUILD_CONF: dict[str, str] = {
    # At local[N] test scale one shuffle partition per core is plenty; on a
    # real cluster AQE coalescing makes the initial number a ceiling, so a
    # production deploy would raise it (e.g. 2-3x total cores).
    "spark.sql.shuffle.partitions": "32",
    # Small-dim broadcast: region/nation/supplier/part style tables should
    # never shuffle (SURVEY.md section 2B joins). 64m is conservative for
    # 128 GiB executors.
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
}


def apply_runtime_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable defaults to an existing session (idempotent)."""
    for key, value in RUNTIME_CONF.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # Non-fatal: an immutable conf on this build — keep going.
            pass
    return spark


def get_spark(
    app_name: str = "batch-processing-iac-aws-spark",
    *,
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a local SparkSession with engine defaults applied."""
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    conf = dict(BUILD_CONF)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    conf.update(RUNTIME_CONF)
    conf.update(extra_conf or {})
    for key, value in conf.items():
        builder = builder.config(key, value)
    return apply_runtime_conf(builder.getOrCreate())
