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
    if not checks:
        raise ValueError("check_counts: checks must be non-empty")
    for n in checks:
        if "`" in n:
            # backticks cannot be escaped portably inside the quoted
            # identifier the stack() expression needs
            raise ValueError(f"check name may not contain a backtick: {n!r}")
    agg = df.agg(
        *[
            # coalesce OUTSIDE the sum too: sum() over ZERO rows is NULL,
            # and a NULL violation count neither passes nor fails a
            # downstream `n_violations == 0` gate — an empty partition
            # must audit as 0 violations
            F.coalesce(
                F.sum(
                    F.when(F.coalesce(pred, F.lit(True)), 1).otherwise(0)
                ),
                F.lit(0),
            ).alias(name)
            for name, pred in checks.items()
        ]
    )
    # names are data (dict keys) but reach the SQL parser: escape string
    # quotes the SQL way
    pairs = ", ".join(
        "'{}', `{}`".format(n.replace("'", "''"), n) for n in checks
    )
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
    Anti join (AQE broadcasts the parent key set when small) + count.
    NULL child keys are exempt, matching SQL FOREIGN KEY semantics (a
    nullable FK with no value is not an orphan) — without the filter the
    null-keyed rows survive the anti join and inflate the count."""
    orphans = child.filter(F.col(child_key).isNotNull()).join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )
    return orphans.agg(F.count(F.lit(1)).alias("n_violations")).select(
        F.lit(name).alias("check"), "n_violations"
    )
