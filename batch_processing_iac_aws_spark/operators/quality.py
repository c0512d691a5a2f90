"""Data-quality audit primitives (training-data pipeline surface).

A 100 TB ingest needs its contract checks to ride the same scan as the
data — not one job per rule. ``check_counts`` folds any number of
row-level predicates into ONE aggregation pass (conditional sums, all
codegen) and unpivots to long ``(check, n_violations)`` form;
``uniqueness_violations`` is a single hash-agg on the key; ``orphan_count``
is a broadcast-or-shuffle anti join counted, never a collect. Compose the
long-form outputs with unionByName for a whole-warehouse audit table.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def check_counts(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Count violations of each named predicate in one scan.

    ``checks`` maps check name -> Column predicate that is TRUE when the
    row VIOLATES the rule (NULL predicate results count as violations:
    a rule that cannot be evaluated has failed). Returns
    ``(check, n_violations)`` — one aggregation, no matter how many rules.
    """
    agg = df.agg(
        *[
            F.sum(
                F.when(F.coalesce(pred, F.lit(True)), 1).otherwise(0)
            ).alias(name)
            for name, pred in checks.items()
        ]
    )
    pairs = ", ".join(f"'{n}', `{n}`" for n in checks)
    return agg.select(
        F.expr(f"stack({len(checks)}, {pairs}) AS (check, n_violations)")
    )


def uniqueness_violations(df: DataFrame, keys: list[str], name: str) -> DataFrame:
    """Rows participating in a duplicated key (0 when ``keys`` is unique):
    one hash aggregation on the key, map-side partial counts."""
    dups = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .agg(F.coalesce(F.sum("__n"), F.lit(0)).alias("n_violations"))
    )
    return dups.select(F.lit(name).alias("check"), "n_violations")


def orphan_count(
    child: DataFrame,
    parent: DataFrame,
    *,
    child_key: str,
    parent_key: str,
    name: str,
) -> DataFrame:
    """Referential-integrity audit: child rows whose key has no parent.
    Anti join (AQE broadcasts the parent key set when small) + count."""
    orphans = child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )
    return orphans.agg(F.count(F.lit(1)).alias("n_violations")).select(
        F.lit(name).alias("check"), "n_violations"
    )
