"""CDC apply / MERGE-INTO semantics as pure DataFrame plans.

The reference has no mutable-table story at all — its sink is a blind
parquet append (pyspark_skript/pyspark_script.py:127-130). A production
warehouse needs the other half: applying a keyed changeset (upserts +
deletes) to a snapshot, and building slowly-changing-dimension history from
a changelog. Both are single-shuffle plans:

* :func:`merge_changes` — one LEFT ANTI join on the merge key plus a
  union of the non-delete change rows; anti joins (unlike FULL OUTER,
  which has no broadcast build side in Spark) let AQE broadcast the
  changeset, so the common CDC case — a day's changes vs a 100 TB
  snapshot — never shuffles the snapshot;
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
    * any change row with a NULL ``op_col`` -> raise_error at execution
      (malformed CDC must fail loudly, not silently upsert)

    Shape: one LEFT ANTI join of the snapshot against the changeset's
    keys plus a union with the non-delete change rows. Unlike the
    textbook full-outer formulation, BOTH operators support a broadcast
    build of the changes side — so the common CDC case (a day's changes
    vs a 100 TB snapshot) never shuffles the snapshot at all (Spark has
    no broadcast build for FULL OUTER joins, and AQE cannot convert one).
    """
    cols = [c for c in target.columns if c != key]
    missing = set(cols) - set(changes.columns)
    if missing:
        raise ValueError(f"changes is missing target columns: {sorted(missing)}")
    checked_op = F.when(
        F.col(op_col).isNull(),
        F.raise_error(
            F.lit(f"merge_changes: NULL {op_col} marker in changeset")
        ),
    ).otherwise(F.col(op_col))
    upserts = changes.filter(checked_op != delete_op).select(key, *cols)
    survivors = target.join(
        changes.select(key), key, "left_anti"
    ).select(key, *cols)
    return survivors.unionByName(upserts)


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
