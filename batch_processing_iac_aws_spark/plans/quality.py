"""Data-quality audit query: a whole-warehouse contract check as one
long-format table. Null rules and range rules fold into one aggregation
pass per table (operators/quality.check_counts); uniqueness and
referential integrity are single hash-agg / anti-join counts. The ranges
are chosen so some checks genuinely trip on TPC-H data (negative
``c_acctbal`` exists by spec) and others are genuinely zero — both sides
of the counter are exercised against the DuckDB oracle."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators.quality import (
    check_counts,
    load_quality_weights,
    orphan_count,
    quality_logit_score,
    uniqueness_violations,
)
from .registry import fixture_path, money_sum, query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "data_quality_audit",
    oracle="""
SELECT 'customer.name_null' AS check,
       CAST(count(*) FILTER (WHERE c_name IS NULL) AS BIGINT) AS n_violations
FROM customer
UNION ALL
SELECT 'customer.acctbal_nonneg',
       CAST(count(*) FILTER (WHERE NOT c_acctbal >= 0
                                OR c_acctbal IS NULL) AS BIGINT)
FROM customer
UNION ALL
SELECT 'customer.key_unique', CAST(COALESCE(sum(n), 0) AS BIGINT)
FROM (SELECT count(*) AS n FROM customer GROUP BY c_custkey HAVING count(*) > 1)
UNION ALL
SELECT 'orders.date_in_range',
       CAST(count(*) FILTER (
            WHERE NOT (o_orderdate BETWEEN DATE '1992-01-01'
                                       AND DATE '1998-12-31')
               OR o_orderdate IS NULL) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orders.totalprice_positive',
       CAST(count(*) FILTER (WHERE NOT o_totalprice > 0
                                OR o_totalprice IS NULL) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orders.custkey_resolves',
       CAST(count(*) AS BIGINT)
FROM orders o WHERE o.o_custkey IS NOT NULL AND NOT EXISTS
    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'lineitem.discount_in_range',
       CAST(count(*) FILTER (WHERE NOT (l_discount BETWEEN 0.0 AND 0.1)
                                OR l_discount IS NULL) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'lineitem.line_unique', CAST(COALESCE(sum(n), 0) AS BIGINT)
FROM (SELECT count(*) AS n FROM lineitem
      GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)
UNION ALL
SELECT 'lineitem.orderkey_resolves',
       CAST(count(*) AS BIGINT)
FROM lineitem l WHERE l.l_orderkey IS NOT NULL AND NOT EXISTS
    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
""",
)
def data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse contract audit in long form ``(check, n_violations)``:
    per-table null/range rules share one scan each; uniqueness and
    referential checks are single-shuffle counts. 9 rules, 5 jobs, zero
    collects — the shape that audits a 100 TB warehouse inside the
    ingest pipeline itself."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    parts = [
        check_counts(
            c,
            {
                "customer.name_null": F.col("c_name").isNull(),
                "customer.acctbal_nonneg": ~(F.col("c_acctbal") >= 0),
            },
        ),
        uniqueness_violations(c, ["c_custkey"], "customer.key_unique"),
        check_counts(
            o,
            {
                "orders.date_in_range": ~F.col("o_orderdate").between(
                    "1992-01-01", "1998-12-31"
                ),
                "orders.totalprice_positive": ~(F.col("o_totalprice") > 0),
            },
        ),
        orphan_count(
            o, c, child_key="o_custkey", parent_key="c_custkey",
            name="orders.custkey_resolves",
        ),
        check_counts(
            li,
            {
                "lineitem.discount_in_range": ~F.col("l_discount").between(
                    0.0, 0.1
                ),
            },
        ),
        uniqueness_violations(
            li, ["l_orderkey", "l_linenumber"], "lineitem.line_unique"
        ),
        orphan_count(
            li, o, child_key="l_orderkey", parent_key="o_orderkey",
            name="lineitem.orderkey_resolves",
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _logit_sql() -> str:
    """The committed weights fixture as the ORACLE-side logit expression —
    weights-as-data on both engines, generated from the SAME file Spark
    reads so the two can never evaluate different models. Fold order
    matches operators.quality.quality_logit_score exactly (bias first,
    then features by sorted name, left-associated adds): an identical
    IEEE expression tree over identical double inputs is bit-identical,
    which is what lets the >= 0 gate and the hash compare work with no
    tolerance. Literals are CAST AS DOUBLE because bare SQL decimals
    parse as DECIMAL in DuckDB and decimal arithmetic would round
    differently."""
    w = load_quality_weights(fixture_path("quality_weights.tsv"))
    expr = f"CAST({w.get('bias', 0.0)!r} AS DOUBLE)"
    for name in sorted(w):
        if name == "bias":
            continue
        expr = (
            f"({expr} + CAST({w[name]!r} AS DOUBLE) * "
            f"CAST({name} AS DOUBLE))"
        )
    return expr


try:
    _LOGIT_SQL = _logit_sql()
except OSError:
    # executor Python workers import this module from the package zip
    # ensure_worker_imports ships, where __file__-relative fixture paths
    # point INSIDE the zip and no fixtures/ exists. The oracle string is
    # DRIVER-only, so registering without it there is harmless — a real
    # checkout missing the fixture still fails loudly via
    # tests/test_registry.py's oracle-count assertion.
    _LOGIT_SQL = None


@query(
    "quality_logit_score",
    oracle=None if _LOGIT_SQL is None else f"""
WITH t AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\s+'),
                       x -> x <> '') AS toks
    FROM documents
), f AS (
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_tokens,
           round(len(list_distinct(toks)) * 1.0 / len(toks), 4) AS uniq_ratio,
           round(list_reduce([CAST(length(x) AS BIGINT) FOR x IN toks],
                             (a, b) -> a + b) * 1.0 / len(toks), 4)
               AS avg_token_len
    FROM t
), s AS (
    SELECT doc_id, n_tokens, uniq_ratio, avg_token_len,
           {_LOGIT_SQL} AS logit
    FROM f
)
SELECT doc_id, n_tokens, uniq_ratio, avg_token_len,
       -- 6dp, not the usual 4: the exact logit IS a <=6-decimal value
       -- (weights <=2dp x features <=4dp), so 6dp rounding is TIE-FREE
       -- (the double sits ~1e-16 from the exact decimal, never near a
       -- half); 4dp hit genuine .00005 ties where Spark's HALF_UP and
       -- DuckDB's float rounding disagree (doc 158 at sf0.001: 1.12085)
       round(logit, 6) AS quality_logit
FROM s
WHERE logit >= 0
""",
)
def quality_logit_score_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fasttext-style quality GATE every pretraining pipeline runs:
    a linear classifier over the quality_features columns with the model
    shipped as a weights FILE (fixtures/quality_weights.tsv — retraining
    is a file swap, the tokenizer-vocabulary discipline applied to
    quality scoring), folded into the scan as one map-only projection.
    The output is the LOGIT, not a sigmoid: a fixed IEEE expression tree
    evaluates bit-identically in any engine, so the ``logit >= 0`` KEEP
    decision is engine-exact and this query hash-oracles the DECISION,
    not just the score — the oracle replays the same fold order over the
    same weights file. 100 TB shape: zero shuffles added to the feature
    pass; the gate prunes at the scan. operators/quality.py:
    quality_logit_score; operators/text.py:quality_features."""
    from ..operators.text import quality_features

    d = _t(spark, sf_dir, "documents")
    w = load_quality_weights(fixture_path("quality_weights.tsv"))
    scored = quality_logit_score(quality_features(d), w)
    return scored.filter(F.col("quality_logit") >= 0).select(
        "doc_id",
        "n_tokens",
        "uniq_ratio",
        "avg_token_len",
        # 6dp is tie-free here — see the oracle comment
        F.round("quality_logit", 6).alias("quality_logit"),
    )


@query(
    "stat_winsorize",
    oracle="""
WITH pct AS (
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.05), 4) AS p_lo,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS p_hi
    FROM lineitem GROUP BY l_returnflag
), clipped AS (
    SELECT l.l_returnflag, pct.p_lo, pct.p_hi, l.l_extendedprice AS orig,
           least(greatest(l.l_extendedprice, pct.p_lo), pct.p_hi) AS v
    FROM lineitem l JOIN pct USING (l_returnflag)
)
SELECT l_returnflag, p_lo, p_hi,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) FILTER (WHERE orig < p_lo OR orig > p_hi) AS BIGINT)
           AS n_clipped,
       CAST(round(sum(CAST(v AS DECIMAL(18,6))), 2) AS DOUBLE)
           AS sum_winsorized
FROM clipped GROUP BY l_returnflag, p_lo, p_hi
""",
)
def stat_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-robust cleaning: winsorize l_extendedprice per returnflag at
    the exact [p05, p95] percentiles, reporting clip counts and the
    decimal-accumulated sum of the clipped column.

    Scale shape: percentile pass is one groupBy over a bounded key (3
    groups) whose 3-row result joins back via broadcast (bounded
    AGGREGATE frame — the forced-broadcast policy allows it); the clip +
    re-agg is a single map + hash-agg pass. Percentile thresholds are
    rounded to 4 decimals on BOTH engines before comparing/clipping so
    interpolation ulp differences cannot flip a clip decision. At 100 TB
    swap percentile -> approx_percentile (exact keeps per-group buffers)."""
    li = load_table(spark, sf_dir, "lineitem")
    pct = li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.05)), 4).alias("p_lo"),
        F.round(F.percentile("l_extendedprice", F.lit(0.95)), 4).alias("p_hi"),
    )
    clipped = li.join(F.broadcast(pct), "l_returnflag").withColumn(
        "__v",
        F.least(F.greatest(F.col("l_extendedprice"), F.col("p_lo")), F.col("p_hi")),
    )
    return clipped.groupBy("l_returnflag", "p_lo", "p_hi").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            (
                (F.col("l_extendedprice") < F.col("p_lo"))
                | (F.col("l_extendedprice") > F.col("p_hi"))
            ).cast("long")
        ).alias("n_clipped"),
        money_sum(F.col("__v")).alias("sum_winsorized"),
    )


@query(
    "stat_robust_zscore",
    oracle="""
WITH med AS (
    SELECT l_returnflag, round(median(l_extendedprice), 4) AS med
    FROM lineitem GROUP BY l_returnflag
), dev AS (
    SELECT l.l_returnflag, med.med,
           abs(l.l_extendedprice - med.med) AS absdev
    FROM lineitem l JOIN med USING (l_returnflag)
), mad AS (
    SELECT l_returnflag, med, round(median(absdev), 4) AS mad
    FROM dev GROUP BY l_returnflag, med
)
SELECT d.l_returnflag, m.med, m.mad,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) FILTER (WHERE 0.6745 * d.absdev / m.mad > 3.5)
            AS BIGINT) AS n_outliers
FROM dev d JOIN mad m ON d.l_returnflag = m.l_returnflag
GROUP BY d.l_returnflag, m.med, m.mad
""",
)
def stat_robust_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median/MAD z-scores (|0.6745·dev/MAD| >
    3.5, the standard modified z-score): mean/stddev break under the very
    outliers you hunt; median/MAD don't.

    Two exact-median passes over a bounded group key, each producing a
    3-row frame that joins back via broadcast (bounded AGGREGATE — the
    forced-broadcast policy allows it); medians are rounded to 4 decimals
    on both engines before the deviation pass so interpolation ulp can't
    flip a threshold comparison. At 100 TB swap median -> approx_percentile."""
    li = load_table(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        F.round(F.median("l_extendedprice"), 4).alias("med")
    )
    dev = li.join(F.broadcast(med), "l_returnflag").withColumn(
        "absdev", F.abs(F.col("l_extendedprice") - F.col("med"))
    )
    mad = dev.groupBy("l_returnflag", "med").agg(
        F.round(F.median("absdev"), 4).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad.select("l_returnflag", "mad")), "l_returnflag")
        .groupBy("l_returnflag", "med", "mad")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                (F.lit(0.6745) * F.col("absdev") / F.col("mad") > 3.5).cast(
                    "long"
                )
            ).alias("n_outliers"),
        )
    )
