"""Interval-encoded time series expansion — the reference's entire analytics
surface, rebuilt Spark-first.

The reference pipeline (pyspark_skript/pyspark_script.py:56-130) takes rows
``(start_time, end_time, samples, <value cols>)`` — each row a run of
identical sensor readings — and emits ``samples`` evenly-spaced per-reading
rows. Its implementation builds an ``idx_array = sequence(0, samples-1)``
(:80-83), maps it to an array<struct> with ``transform`` (:86-96), then
``posexplode``s (:105) and extracts struct fields (:108-114).

The Spark-first rebuild collapses that to a single generator: posexplode the
sequence directly and compute the per-sample timestamps from the position —
one ``Generate`` + one ``Project`` in the physical plan, no intermediate
array-of-struct materialization (half the per-row memory during expansion,
which matters when one row fans out to 3600).

Two semantic modes (SURVEY.md §2A edge cases):

* ``strict`` (default): rows with ``samples`` NULL or < 1 are dropped by an
  explicit filter (pushed down to the scan); timestamps stay TIMESTAMP, with
  microsecond arithmetic (no sub-second loss).
* ``compat``: byte-faithful to the reference, including its bugs — epoch
  *seconds* truncation (``unix_timestamp``, :73), string-typed output
  timestamps (``from_unixtime``, :91-92), and the spurious ``[0, -1]`` pair
  emitted for ``samples = 0`` (``sequence(0, -1)`` = [0, -1], :82), with NULL
  ``samples`` rows silently dropped by the non-outer posexplode (:105).

Scale posture: the expansion is embarrassingly parallel (no shuffle); output
row count is sum(samples), so the only 100 TB concern is output partition
sizing — pair with io.write_parquet's file-size targeting. The reference's
global orderBy (:67) is omitted here (per-row expansion is order-independent)
and offered as ``sort_within_partitions`` for time-clustered files.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def expand_intervals(
    df: DataFrame,
    *,
    start: str = "start_time",
    end: str = "end_time",
    samples: str = "samples",
    mode: str = "strict",
    idx_col: str = "sample_idx",
    keep_interval_cols: bool = False,
) -> DataFrame:
    """Expand each interval row into ``samples`` evenly-spaced sample rows.

    strict mode output: all pass-through columns, plus ``idx_col`` (0-based
    position) and ``start``/``end`` overwritten with the per-sample interval
    ``[start + i*delta, start + (i+1)*delta]`` in TIMESTAMP at microsecond
    resolution.

    compat mode reproduces the reference's output exactly (string timestamps,
    second truncation, [0,-1] artifact for samples=0).

    ``keep_interval_cols=True`` additionally retains the ORIGINAL interval
    bounds as ``interval_start`` / ``interval_end`` (the per-sample values
    overwrite ``start``/``end``), so downstream code can recover which run
    a sample came from without a join back.
    """
    if mode not in ("strict", "compat"):
        raise ValueError(f"mode must be 'strict' or 'compat', got {mode!r}")

    s, e, n = F.col(start), F.col(end), F.col(samples)

    if keep_interval_cols:
        df = df.withColumn("interval_start", s).withColumn("interval_end", e)

    if mode == "strict":
        out = df.filter(n.isNotNull() & (n >= 1))
        # microsecond-exact arithmetic on BIGINT epochs; delta as double of
        # micros, floored per-sample so first sample == start exactly.
        out = out.withColumn("__start_us", F.unix_micros(s.cast("timestamp")))
        out = out.withColumn("__end_us", F.unix_micros(e.cast("timestamp")))
        out = out.withColumn(
            "__delta_us",
            (F.col("__end_us") - F.col("__start_us")) / n.cast("double"),
        )
        out = out.select(
            "*",
            F.posexplode(F.sequence(F.lit(0), n.cast("int") - F.lit(1))).alias(
                idx_col, "__i"
            ),
        )
        sample_start = F.timestamp_micros(
            F.col("__start_us")
            + F.floor(F.col(idx_col) * F.col("__delta_us")).cast("long")
        )
        sample_end = F.timestamp_micros(
            F.col("__start_us")
            + F.floor((F.col(idx_col) + 1) * F.col("__delta_us")).cast("long")
        )
        return (
            out.withColumn(start, sample_start)
            .withColumn(end, sample_end)
            .drop("__start_us", "__end_us", "__delta_us", "__i")
        )

    # compat: faithful reproduction of pyspark_skript/pyspark_script.py:70-124
    out = df.withColumn(
        "timedelta_per_sample",
        F.when(
            n.isNotNull() & (n != 0),
            (F.unix_timestamp(e) - F.unix_timestamp(s)) / n,
        ).otherwise(F.lit(0)),
    )
    # F.sequence compiles to the identical Sequence expression as the
    # reference's raw-SQL string (including the [0,-1] artifact for
    # samples=0) WITHOUT splicing a column name into SQL — a name like
    # 'n samples' would be a parse error under the expr form
    out = out.withColumn("idx_array", F.sequence(F.lit(0), n - F.lit(1)))
    out = out.select(
        "*", F.posexplode("idx_array").alias(idx_col, "__i")
    ).drop("idx_array")
    base = F.unix_timestamp(s)
    delta = F.col("timedelta_per_sample")
    out = out.withColumn(
        "__new_start", F.from_unixtime(base + F.col(idx_col) * delta)
    ).withColumn(
        "__new_end", F.from_unixtime(base + (F.col(idx_col) + 1) * delta)
    )
    return (
        out.withColumn(start, F.col("__new_start"))
        .withColumn(end, F.col("__new_end"))
        .drop("__new_start", "__new_end", "timedelta_per_sample", "__i")
    )


def intervals_from_events(
    events: DataFrame,
    *,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    value_cents_exact: bool = False,
) -> DataFrame:
    """Derive an interval-encoded frame from an event stream: one interval
    per key spanning [min(ts), max(ts)] with count(*) samples and the mean
    reading — the SURVEY.md §7 stage-0 source frame for the flagship query.

    ``value_cents_exact=True`` computes the mean ROUNDED TO 4dp exactly
    for values on a 2-decimal grid: sum integer cents, half-up-round the
    rational (cents*100)/n with integer arithmetic ((2a + n) DIV 2n for
    a, n >= 0), one final /1e4 landing on a 4dp grid every engine
    represents identically. The plain double avg is one summation-order
    ulp from the decimal boundary whenever the exact mean IS a 4dp tie —
    round(avg, 4) then flips between engines (seen at sf0.1, user 51:
    exact mean 56.20875). Requires nonnegative grid values and
    sum(cents)*200 < 2^63 per key."""
    if value_cents_exact:
        cents = F.round(F.col(value) * 100).cast("long")
        return (
            events.groupBy(key)
            .agg(
                F.min(ts).alias("start_time"),
                F.max(ts).alias("end_time"),
                F.count(F.lit(1)).alias("samples"),
                F.sum(cents).alias("__cents"),
            )
            .withColumn(
                "reading",
                F.expr(
                    "(2 * __cents * 100 + samples) DIV (2 * samples)"
                )
                / F.lit(10000.0),
            )
            .drop("__cents")
        )
    return events.groupBy(key).agg(
        F.min(ts).alias("start_time"),
        F.max(ts).alias("end_time"),
        # bigint, not int: at fact scale a key can exceed 2^31-1 events,
        # and a wrapped negative count would be silently DROPPED by
        # expand_intervals' n >= 1 filter; the sequence cast happens there
        F.count(F.lit(1)).alias("samples"),
        F.avg(value).alias("reading"),
    )


def sort_within_partitions(df: DataFrame, *cols: str) -> DataFrame:
    """Time-cluster file contents without a global range shuffle — the scale-
    aware demotion of the reference's global orderBy (pyspark_script.py:67)."""
    return df.sortWithinPartitions(*[F.col(c).asc() for c in cols])
