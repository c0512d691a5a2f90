"""Skew mitigation: salting recipes for hot keys that overwhelm a single
shuffle partition.

AQE's skew-join splitting (on by default, session.py) handles moderate
skew at runtime; these operators are the structural fix when one key is
pathologically hot — e.g. a null-ish default user owning 30% of a 100 TB
fact table.

* :func:`salted_aggregate` — two-phase aggregation: group by
  (key, salt) first (spreads one hot key over ``n_salts`` reducers), then
  re-aggregate by key. Works for any algebraic aggregate expressed as
  partial + merge (sum/count/min/max here).
* :func:`salted_join` — replicate the (small-ish) right side ``n_salts``
  times and salt the left side deterministically, so one hot join key
  fans across ``n_salts`` tasks instead of one. Equi-join results are
  identical to the unsalted join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: Deterministic per-row salt: hash of the whole row's physical position is
#: NOT deterministic, so salt from stable columns instead.


def salted_aggregate(
    df: DataFrame,
    key: str,
    aggs: dict[str, str],
    *,
    salt_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> one of sum/count/min/max over an input
    column, e.g. ``{"total": "sum:value", "n": "count:*"}``. ``salt_col``
    must be a stable input column (its hash spreads the hot key); results
    are identical to a direct groupBy.
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts))
    )

    partial_exprs = []
    final_exprs = []
    for out, spec in aggs.items():
        op, _, col = spec.partition(":")
        p = f"__p_{out}"
        if op == "sum":
            partial_exprs.append(F.sum(col).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif op == "count":
            # count:* counts rows; count:col counts NON-NULL values of
            # col, matching a direct F.count(col) — silently counting
            # rows for a named column would diverge from the unsalted agg
            cexpr = F.count(F.lit(1)) if col == "*" else F.count(col)
            partial_exprs.append(cexpr.alias(p))
            final_exprs.append(F.sum(p).cast("long").alias(out))
        elif op == "min":
            partial_exprs.append(F.min(col).alias(p))
            final_exprs.append(F.min(p).alias(out))
        elif op == "max":
            partial_exprs.append(F.max(col).alias(p))
            final_exprs.append(F.max(p).alias(out))
        else:
            raise ValueError(f"unsupported agg {spec!r}")

    partial = salted.groupBy(key, "__salt").agg(*partial_exprs)
    return partial.groupBy(key).agg(*final_exprs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    salt_from: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: left rows get a deterministic salt from
    ``salt_from`` (a stable left column), the right side is replicated once
    per salt value, and the join key becomes (key, salt). Output equals the
    unsalted join; right-side replication costs n_salts x |right|, so keep
    the replicated side the smaller one.

    ``how`` is restricted to joins that preserve unsalted semantics:
    an unmatched RIGHT row exists n_salts times after replication, so
    right/full outer joins would emit it n_salts times — refused."""
    if how.replace("_", "").lower() in (
        "right", "rightouter", "full", "fullouter", "outer"
    ):
        raise ValueError(
            f"salted_join(how={how!r}): right/full outer joins would "
            "emit each unmatched right row n_salts times (the right side "
            "is replicated); salt the other side or use the plain join"
        )
    l = left.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts))
    )
    r = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>")),
    )
    return l.join(r, [key, "__salt"], how).drop("__salt")
