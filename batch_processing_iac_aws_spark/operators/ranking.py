"""Distributed global ranking without a single-task window.

An unpartitioned ``Window.orderBy`` (global rank / ntile / percent_rank)
collapses all rows into ONE task — the documented bottleneck in
plans/windows.py:window_ntile. The scalable formulation is two-pass:

1. range-partition by the order columns (the same shuffle a global sort
   uses), sort within partitions;
2. per-partition row counts (tiny: one row per partition) are collected,
   turned into cumulative offsets, and broadcast back; each row's global
   position = its partition's offset + its local index.

The local index comes from ``monotonically_increasing_id``'s documented
layout (partition_id * 2^33 + in-partition counter) — no RDD, no
mapPartitions, no second wide shuffle. The only driver traffic is one long
per shuffle partition.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_LOCAL_MASK = (1 << 33) - 1


def _global_row_number_with_total(
    df: DataFrame, *order_cols: str, out: str = "rn"
) -> tuple[DataFrame, int]:
    """(ranked df, total row count). The total falls out of the offsets
    collect for free — callers needing N (percent_rank, ntile) must not
    pay a second count() job."""
    cols = [F.col(c) for c in order_cols]
    ranged = df.repartitionByRange(*cols).sortWithinPartitions(*cols)
    # MATERIALIZE before the two actions below (offsets collect + the
    # returned frame): repartitionByRange samples its boundaries per
    # action and monotonically_increasing_id reassigns per action, so an
    # unmaterialized lineage could put different rows in a partition than
    # the offsets were computed from — duplicate/skipped global row
    # numbers. An eager localCheckpoint pins one layout for both AND,
    # unlike a .persist() this function could never safely release (the
    # returned frame still references it), its blocks are freed by the
    # ContextCleaner once the RDD is GC'd — no pinned-cache growth in a
    # long-lived session.
    with_ids = ranged.withColumn(
        "__mono", F.monotonically_increasing_id()
    ).localCheckpoint(eager=True)
    with_ids = with_ids.withColumn(
        "__pid", F.shiftrightunsigned("__mono", 33)
    ).withColumn("__local", F.col("__mono").bitwiseAND(F.lit(_LOCAL_MASK)))

    sizes = (
        with_ids.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__n"))
        .orderBy("__pid")
        .collect()
    )
    offset = 0
    offsets = []
    for r in sizes:
        offsets.append((r["__pid"], offset))
        offset += r["__n"]
    spark = df.sparkSession
    from ..session import local_frame

    # Arrow path, NOT createDataFrame(list): the pickled-parallelize form
    # makes every consumer job spin Python workers to deserialize two
    # longs per partition — a measured ~4s hidden fixed cost per ranking
    # call at local[32]
    off_df = local_frame(spark, offsets, "__pid long, __offset long")

    ranked = (
        with_ids.join(F.broadcast(off_df), "__pid")
        .withColumn(out, F.col("__offset") + F.col("__local") + 1)
        .drop("__mono", "__pid", "__local", "__offset")
    )
    return ranked, offset


def global_row_number(
    df: DataFrame, *order_cols: str, out: str = "rn"
) -> DataFrame:
    """Global 1-based row number in ``order_cols`` order, computed with a
    range shuffle + per-partition offsets instead of a one-task window.
    Include a unique tiebreaker in ``order_cols`` for determinism."""
    ranked, _ = _global_row_number_with_total(df, *order_cols, out=out)
    return ranked


def global_percent_rank(
    df: DataFrame, *order_cols: str, out: str = "pct_rank"
) -> DataFrame:
    """percent_rank = (rn - 1) / (N - 1) on top of global_row_number.
    NOTE: ties get distinct row numbers (tiebreaker order), which matches
    percent_rank only when order_cols end in a unique key. N comes from
    the offsets collect — no extra count() job."""
    ranked, n = _global_row_number_with_total(df, *order_cols, out="__rn")
    denom = max(n - 1, 1)
    return ranked.withColumn(
        out, (F.col("__rn") - 1).cast("double") / F.lit(float(denom))
    ).drop("__rn")


def global_ntile(
    df: DataFrame, n_tiles: int, *order_cols: str, out: str = "tile"
) -> DataFrame:
    """ntile(n) from the global row number: tile = floor((rn-1) * n / N) + 1
    gives the same equal-split semantics as the window ntile (larger tiles
    first when N % n != 0 matches because Spark splits remainder forward).
    N comes from the offsets collect — no extra count() job."""
    if n_tiles < 1:
        raise ValueError(f"n_tiles must be >= 1, got {n_tiles}")
    ranked, n = _global_row_number_with_total(df, *order_cols, out="__rn")
    base, rem = divmod(n, n_tiles)
    # first `rem` tiles have base+1 rows (SQL ntile semantics)
    big = rem * (base + 1)
    tile = F.when(
        F.col("__rn") <= big,
        ((F.col("__rn") - 1) / (base + 1)).cast("long") + 1,
    ).otherwise(
        F.when(
            F.lit(base) > 0,
            ((F.col("__rn") - big - 1) / base).cast("long") + rem + 1,
        ).otherwise(F.lit(None))
    )
    return ranked.withColumn(out, tile.cast("int")).drop("__rn")
