"""CDC apply / MERGE-INTO semantics as pure DataFrame plans.

The reference has no mutable-table story at all — its sink is a blind
parquet append (pyspark_skript/pyspark_script.py:127-130). A production
warehouse needs the other half: applying a keyed changeset (upserts +
deletes) to a snapshot, and building slowly-changing-dimension history from
a changelog. Both are single-shuffle plans:

* :func:`merge_changes` — one full-outer shuffle join on the merge key
  (AQE broadcasts the changeset side when it is small enough, which is the
  common CDC case: a day's changes vs a 100 TB snapshot);
* :func:`scd2_from_changelog` — one hash shuffle on the key + an in-
  partition window (lead); no global sort.

At 100 TB the snapshot side should be bucketed/clustered by the merge key
(io.write_clustered_parquet) so the join degrades to a co-located merge
rather than a full re-shuffle of the snapshot.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def merge_changes(
    target: DataFrame,
    changes: DataFrame,
    *,
    key: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply a keyed changeset to a snapshot (MERGE INTO semantics).

    ``changes`` must carry the full target column set plus ``op_col`` and at
    most ONE row per key (pre-collapse a raw changelog with latest-wins —
    e.g. ``row_number() over (partition by key order by ts desc) = 1``).

    Row outcome per key:

    * key in both, op != delete  -> changeset row (full-row upsert)
    * key in both, op == delete  -> dropped
    * key only in target         -> target row unchanged
    * key only in changes        -> inserted unless op == delete

    One full-outer hash join on ``key``; every column resolution is a
    codegen ``coalesce`` over two structs — no UDFs, no driver loop.
    """
    cols = [c for c in target.columns if c != key]
    missing = set(cols) - set(changes.columns)
    if missing:
        raise ValueError(f"changes is missing target columns: {sorted(missing)}")
    t = target.select(key, F.struct(*cols).alias("__t"))
    c = changes.select(key, F.struct(*cols).alias("__c"), F.col(op_col))
    merged = (
        t.join(c, key, "full_outer")
        # present-in-changes + delete marker -> drop (covers both matched
        # deletes and deletes for already-absent keys)
        .filter(F.col(op_col).isNull() | (F.col(op_col) != delete_op))
        .withColumn("__r", F.coalesce("__c", "__t"))
    )
    return merged.select(key, *[F.col(f"__r.{c}").alias(c) for c in cols])


def snapshot_diff(
    before: DataFrame,
    after: DataFrame,
    *,
    key: str,
) -> DataFrame:
    """Diff two keyed snapshots into a changeset: one row per key that was
    ``added``, ``removed``, or ``changed`` (any non-key column differs),
    carrying the after-image for added/changed and the before-image for
    removed. Unchanged keys are dropped.

    The inverse of :func:`merge_changes` — applying the diff of (A, B) to A
    reproduces B — which makes incremental re-publishes of a 100 TB table
    shippable as a small changeset. One full-outer hash join on ``key``;
    the change test is a single null-safe struct comparison (codegen), not
    per-column Python. Both snapshots should share a clustered layout on
    ``key`` so the join co-locates.
    """
    cols = [c for c in before.columns if c != key]
    if set(cols) != set(after.columns) - {key}:
        raise ValueError("snapshots must share one schema")
    b = before.select(key, F.struct(*cols).alias("__b"))
    a = after.select(key, F.struct(*cols).alias("__a"))
    joined = b.join(a, key, "full_outer").withColumn(
        "change_type",
        F.when(F.col("__b").isNull(), "added")
        .when(F.col("__a").isNull(), "removed")
        .when(~F.col("__a").eqNullSafe(F.col("__b")), "changed"),
    )
    img = F.coalesce("__a", "__b")
    return joined.filter(F.col("change_type").isNotNull()).select(
        key,
        "change_type",
        *[img.getField(c).alias(c) for c in cols],
    )


def scd2_from_changelog(
    changes: DataFrame,
    *,
    key: str,
    ts: str,
    tiebreak: str,
    attrs: list[str],
) -> DataFrame:
    """Build a type-2 slowly-changing dimension from a change stream: each
    change opens a version effective ``[ts, next change's ts)``; the last
    version per key is current (``valid_to`` NULL).

    ``tiebreak`` makes same-timestamp changes deterministic (zero-length
    versions are kept, so the version count equals the change count and
    re-runs are idempotent). One shuffle on ``key``; the window is
    per-key ordered, never global.
    """
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    out = changes.select(
        key,
        F.row_number().over(w).alias("version"),
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w).alias("valid_to"),
        *attrs,
    )
    return out.withColumn("is_current", F.col("valid_to").isNull())
