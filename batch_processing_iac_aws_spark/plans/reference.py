"""Reference-parity queries: interval expansion (the reference's flagship
ETL, pyspark_skript/pyspark_script.py:56-130) and latest-partition selection
(:38-52), both re-expressed over the driver's `events` table."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators.timeseries import expand_intervals, intervals_from_events
from .registry import query


@query(
    "interval_expand",
    oracle="""
WITH intervals AS (
    SELECT user_id,
           epoch_us(min(ts)) AS start_us,
           epoch_us(max(ts)) AS end_us,
           CAST(count(*) AS INT) AS samples,
           round(avg(value), 4) AS reading
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
    projection; no shuffle beyond the single groupBy."""
    events = load_table(spark, sf_dir, "events")
    intervals = intervals_from_events(events).withColumn(
        "reading", F.round("reading", 4)
    )
    expanded = expand_intervals(intervals, mode="strict")
    return expanded.select(
        "user_id",
        F.col("sample_idx").cast("long").alias("sample_idx"),
        F.unix_micros(F.col("start_time").cast("timestamp")).alias("sample_us"),
        "samples",
        "reading",
    )


@query(
    "latest_partition",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 4) AS sum_value
FROM events
WHERE CAST(ts AS DATE) = (SELECT max(CAST(ts AS DATE)) FROM events)
""",
)
def latest_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-partition selection (reference picks max filename date,
    pyspark_script.py:38-52) as partition pruning: aggregate only the most
    recent event date. The max-date subframe is broadcast, so the only wide
    exchange is the final single-row aggregation."""
    events = load_table(spark, sf_dir, "events").withColumn(
        "d", F.to_date("ts")
    )
    latest = events.agg(F.max("d").alias("d"))
    return (
        events.join(F.broadcast(latest), "d")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
