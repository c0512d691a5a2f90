"""Reference-parity queries: interval expansion (the reference's flagship
ETL, pyspark_skript/pyspark_script.py:56-130) and latest-partition selection
(:38-52), both re-expressed over the driver's `events` table."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators.timeseries import expand_intervals, intervals_from_events
from .registry import fixture_path, money_sum, query, scratch_dir


@query(
    "interval_expand",
    oracle="""
WITH intervals AS (
    SELECT user_id,
           epoch_us(min(ts)) AS start_us,
           epoch_us(max(ts)) AS end_us,
           CAST(count(*) AS INT) AS samples,
           -- exact mean at 4dp via integer cents (values live on a 2dp
           -- grid): round(avg(value), 4) put a true decimal tie
           -- (3147.69 / 56 = 56.20875 at sf0.1) a double-sum ulp away
           -- from the boundary, and the engines landed on opposite
           -- sides. (2a + n) // (2n) is half-up of a/n for a, n >= 0;
           -- the single final float op lands on a 4dp grid both
           -- engines represent identically.
           ((2 * sum(CAST(round(value * 100) AS BIGINT)) * 100
             + count(*)) // (2 * count(*))) / 10000.0 AS reading
    FROM events
    GROUP BY user_id
)
SELECT i.user_id,
       t.idx AS sample_idx,
       CAST(i.start_us + FLOOR(t.idx * ((i.end_us - i.start_us) / i.samples))
            AS BIGINT) AS sample_us,
       i.samples,
       i.reading
FROM intervals i, UNNEST(generate_series(0, CAST(i.samples AS BIGINT) - 1)) AS t(idx)
""",
)
def interval_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: events -> per-user [min(ts), max(ts), count] intervals ->
    expand to evenly-spaced samples. Exercises scan, agg, generator, HOF-free
    projection; no shuffle beyond the single groupBy.

    reading is the per-user mean at 4dp computed EXACTLY: values sit on a
    2-decimal grid, so summing integer cents and half-up-rounding the
    rational (cents*100)/n with integer arithmetic is engine-exact where
    round(avg(double), 4) was one summation-order ulp from a decimal tie
    (first diverged on user 51 at sf0.1: exact mean 56.20875, Spark's
    binary-exact HALF_UP said 56.2087, DuckDB 56.2088). Off-tie rows are
    unchanged (|double avg - exact| << tie distance); the final /1e4 is
    the family's one-float-op rule. Cents sums need |values| on a 2dp
    grid and sum(cents)*200 < 2^63 — ~5e16 value-sum per key, far past
    any fact scale."""
    events = load_table(spark, sf_dir, "events")
    intervals = (
        intervals_from_events(events, value_cents_exact=True)
    )
    expanded = expand_intervals(intervals, mode="strict")
    return expanded.select(
        "user_id",
        F.col("sample_idx").cast("long").alias("sample_idx"),
        F.unix_micros(F.col("start_time").cast("timestamp")).alias("sample_us"),
        "samples",
        "reading",
    )


_CSV_DIR = fixture_path("csv_land")
_CSV_LATEST = f"{_CSV_DIR}/20230703_intervals.csv"


@query(
    "csv_expand",
    oracle=f"""
WITH src AS (
    SELECT sensor_id,
           epoch_us(start_time) AS start_us,
           epoch_us(end_time)   AS end_us,
           samples, reading
    FROM read_csv('{_CSV_LATEST}', header=true,
                  columns={{'sensor_id': 'INT', 'start_time': 'TIMESTAMP',
                            'end_time': 'TIMESTAMP', 'samples': 'INT',
                            'reading': 'DOUBLE'}})
    WHERE samples IS NOT NULL AND samples >= 1
)
SELECT sensor_id,
       t.idx AS sample_idx,
       CAST(start_us + FLOOR(t.idx * ((end_us - start_us) / samples))
            AS BIGINT) AS sample_us,
       samples, reading
FROM src, UNNEST(generate_series(0, CAST(samples AS BIGINT) - 1)) AS t(idx)
""",
)
def csv_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's CSV path end-to-end (§2A #1-#3): discover dated CSVs
    in a dataset directory, pick the latest by filename date
    (pyspark_skript/pyspark_script.py:20-52), read with an EXPLICIT schema
    (the reference's inferSchema costs an extra eager scan, :56-61), and
    run the strict interval expansion. The fixture directory contains an
    older decoy file, so a wrong argmax would change the result."""
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
        TimestampNTZType,
    )

    from ..io import read_csv
    from ..sources.files import latest_dated_file

    latest = latest_dated_file(_CSV_DIR)
    if latest is None:
        raise FileNotFoundError(f"no dated CSV in {_CSV_DIR}")
    schema = StructType(
        [
            StructField("sensor_id", IntegerType()),
            StructField("start_time", TimestampNTZType()),
            StructField("end_time", TimestampNTZType()),
            StructField("samples", IntegerType()),
            StructField("reading", DoubleType()),
        ]
    )
    df = read_csv(spark, str(latest), schema=schema)
    expanded = expand_intervals(df, mode="strict")
    return expanded.select(
        "sensor_id",
        F.col("sample_idx").cast("long").alias("sample_idx"),
        F.unix_micros(F.col("start_time").cast("timestamp")).alias("sample_us"),
        "samples",
        "reading",
    )


_JSONL = fixture_path("json_land", "readings.jsonl")


@query(
    "json_expand",
    oracle=f"""
WITH src AS (
    SELECT sensor_id,
           epoch_us(start_time) AS start_us,
           epoch_us(end_time)   AS end_us,
           samples, reading
    FROM read_json('{_JSONL}', format='newline_delimited',
                   columns={{'sensor_id': 'INT', 'start_time': 'TIMESTAMP',
                             'end_time': 'TIMESTAMP', 'samples': 'INT',
                             'reading': 'DOUBLE'}})
    WHERE samples IS NOT NULL AND samples >= 1
)
SELECT sensor_id,
       t.idx AS sample_idx,
       CAST(start_us + FLOOR(t.idx * ((end_us - start_us) / samples))
            AS BIGINT) AS sample_us,
       samples, reading
FROM src, UNNEST(generate_series(0, CAST(samples AS BIGINT) - 1)) AS t(idx)
""",
)
def json_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source (§2B sources/sinks): explicit-schema read of a
    newline-delimited JSON dataset (no schema inference scan) through the
    same strict expansion as csv_expand — source formats are interchangeable
    front-ends to one plan."""
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
        TimestampNTZType,
    )

    from ..io import read_json

    schema = StructType(
        [
            StructField("sensor_id", IntegerType()),
            StructField("start_time", TimestampNTZType()),
            StructField("end_time", TimestampNTZType()),
            StructField("samples", IntegerType()),
            StructField("reading", DoubleType()),
        ]
    )
    df = read_json(spark, _JSONL, schema=schema)
    expanded = expand_intervals(df, mode="strict")
    return expanded.select(
        "sensor_id",
        F.col("sample_idx").cast("long").alias("sample_idx"),
        F.unix_micros(F.col("start_time").cast("timestamp")).alias("sample_us"),
        "samples",
        "reading",
    )


@query(
    "orc_roundtrip",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey
FROM nation
""",
)
def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + scan (§2B sources/sinks): write the nation table to ORC,
    read it back, and prove value-identity against the parquet source —
    both are native vectorized columnar formats with the same
    pushdown/pruning guarantees. Unique temp dir per call; idempotent."""

    from ..io import read_orc, write_orc

    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    out = scratch_dir("orc_rt", sf_dir) + "/nation"
    write_orc(n, out)
    return read_orc(spark, out)


@query(
    "zorder_roundtrip",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE)
           AS sum_price
FROM lineitem
WHERE l_partkey BETWEEN 100 AND 200 AND l_suppkey BETWEEN 10 AND 30
""",
)
def zorder_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustered sink + scan (io.write_zorder_parquet): rewrite
    lineitem Morton-interleaved on (l_partkey, l_suppkey), read it back, and
    run a two-dimensional range filter — value-identical to the same filter
    on the unclustered source, while the layout lets the scan prune most
    files from footer min/max stats on EITHER column (asserted quantitatively
    in tests/test_zorder.py). Unique temp dir per call; idempotent."""

    from ..io import write_zorder_parquet

    l = load_table(spark, sf_dir, "lineitem")
    out = scratch_dir("zorder_rt", sf_dir) + "/lineitem"
    write_zorder_parquet(
        l, out, zorder_by=["l_partkey", "l_suppkey"], num_files=16
    )
    back = spark.read.parquet(out)
    return back.filter(
        F.col("l_partkey").between(100, 200) & F.col("l_suppkey").between(10, 30)
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        money_sum(F.col("l_extendedprice")).alias("sum_price"),
    )


@query(
    "latest_partition",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
FROM events
WHERE CAST(ts AS DATE) = (SELECT max(CAST(ts AS DATE)) FROM events)
""",
)
def latest_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-partition selection (reference picks max filename date,
    pyspark_script.py:38-52) as partition pruning: aggregate only the most
    recent event date. The max-date subframe is broadcast, so the only wide
    exchange is the final single-row aggregation."""
    from ..sources.files import latest_partition as keep_latest

    events = load_table(spark, sf_dir, "events").withColumn(
        "d", F.to_date("ts")
    )
    return (
        keep_latest(events, "d")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum(F.col("value"), 4).alias("sum_value"),
        )
    )


@query(
    "parquet_schema_merge",
    oracle="""
SELECT n_nationkey, n_name,
       CASE WHEN n_nationkey < 13 THEN NULL ELSE n_regionkey END AS n_regionkey
FROM nation
""",
)
def parquet_schema_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read (§2B sources/sinks): an early batch written
    WITHOUT n_regionkey and a later batch WITH it, scanned together under
    mergeSchema=true — old files surface the added column as NULL, the
    union schema comes from parquet footers only. This is how a 100 TB
    append-only lake absorbs a column add without rewriting history.
    Unique temp dir per call; idempotent."""

    n = load_table(spark, sf_dir, "nation")
    out = scratch_dir("schema_merge", sf_dir)
    n.filter(F.col("n_nationkey") < 13).select("n_nationkey", "n_name").write.mode(
        "overwrite"
    ).parquet(out + "/v1")
    n.filter(F.col("n_nationkey") >= 13).select(
        "n_nationkey", "n_name", "n_regionkey"
    ).write.mode("overwrite").parquet(out + "/v2")
    return spark.read.option("mergeSchema", "true").parquet(
        out + "/v1", out + "/v2"
    )
