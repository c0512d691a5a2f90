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


def load_quality_weights(path: str) -> "dict[str, float]":
    """Read a quality-model weights file (one ``feature<TAB>weight`` per
    line; ``bias`` is a feature name like any other) — the model ships
    as DATA, the tokenizer-vocabulary discipline applied to quality
    scoring: retraining the classifier is a file swap, never a code
    change, and both engines read the same numbers."""
    weights: dict[str, float] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            name, w = line.split("\t")
            weights[name] = float(w)
    return weights


def quality_logit_score(
    df: "DataFrame",
    weights: "dict[str, float]",
    *,
    out_col: str = "quality_logit",
) -> "DataFrame":
    """Linear quality-classifier score over ALREADY-COMPUTED feature
    columns (operators.text.quality_features et al.): logit = bias +
    sum(w_i * x_i), one map-only projection folded into the scan — the
    fasttext-style quality-gate shape with the model as a weights file.
    The LOGIT (not a sigmoid) is the output on purpose: a fixed
    expression tree of IEEE doubles evaluates bit-identically in any
    engine, so thresholds like ``logit >= 0`` are engine-exact and the
    registered twin can hash-oracle; monotone transforms preserve every
    ranking/gating decision, so the sigmoid adds nothing but exp()'s
    cross-engine last-ulp risk. Unknown weight names raise (a silently
    dropped feature is a silently different model); NULL features
    propagate NULL — an unscorable doc must fail a >= gate, the
    empty-document rule."""
    missing = [
        name for name in weights
        if name != "bias" and name not in df.columns
    ]
    if missing:
        raise ValueError(
            f"quality_logit_score: weight(s) {missing} have no matching "
            "feature column — a dropped feature is a different model"
        )
    expr = F.lit(float(weights.get("bias", 0.0)))
    for name, w in sorted(weights.items()):
        if name == "bias":
            continue
        expr = expr + F.lit(float(w)) * F.col(name).cast("double")
    return df.withColumn(out_col, expr)
