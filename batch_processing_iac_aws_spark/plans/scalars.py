"""Scalar-function surface (SURVEY.md §2B): string, date/time, math, array
(incl. higher-order functions — the reference's core trick,
pyspark_skript/pyspark_script.py:80-96), map, JSON, conditional/null, and
cast semantics. All JVM-side built-ins — none of this touches Python row
processing, so every expression stays inside whole-stage codegen.

Cross-engine canonicalization notes (Spark vs DuckDB):
* dayofweek: Spark is 1-7 Sunday=1, DuckDB 0-6 Sunday=0 -> oracle adds 1;
* year()/month()/day(): Spark INT, DuckDB BIGINT -> oracle casts to INT;
* transcendentals (ln/exp/sqrt) rounded to 6 — libm results agree to well
  under 1e-6 at these magnitudes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "string_funcs",
    oracle="""
SELECT p_partkey,
       lower(p_name)                                   AS name_lower,
       upper(p_brand)                                  AS brand_upper,
       CAST(length(p_name) AS INT)                     AS name_len,
       substr(p_name, 1, 5)                            AS name_pfx,
       concat_ws('-', p_brand, p_type)                 AS brand_type,
       replace(p_name, ' ', '_')                       AS name_snake,
       reverse(p_type)                                 AS type_rev,
       CAST(contains(p_name, 'a') AS INT)              AS has_a,
       CAST(starts_with(p_type, 'S') AS INT)           AS is_s,
       CAST(strpos(p_name, 'e') AS INT)                AS first_e,
       lpad(CAST(p_partkey AS VARCHAR), 8, '0')        AS key_padded,
       regexp_extract(p_type, '([A-Z]+)', 1)           AS type_word,
       CAST(len(string_split(p_name, ' ')) AS INT)     AS n_words
FROM part
""",
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.reverse("p_type").alias("type_rev"),
        F.col("p_name").contains("a").cast("int").alias("has_a"),
        F.col("p_type").startswith("S").cast("int").alias("is_s"),
        F.instr("p_name", "e").alias("first_e"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
        F.regexp_extract("p_type", "([A-Z]+)", 1).alias("type_word"),
        F.size(F.split("p_name", " ")).alias("n_words"),
    )


@query(
    "date_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT)                   AS yr,
       CAST(month(o_orderdate) AS INT)                  AS mo,
       CAST(day(o_orderdate) AS INT)                    AS dom,
       CAST(quarter(o_orderdate) AS INT)                AS qtr,
       CAST(dayofweek(o_orderdate) + 1 AS INT)          AS dow,
       date_trunc('month', o_orderdate)                 AS month_start,
       CAST(o_orderdate AS DATE) + 30                   AS due_date,
       CAST(date_diff('day', o_orderdate,
                      TIMESTAMP '2002-01-01') AS INT)   AS days_to_2002,
       last_day(CAST(o_orderdate AS DATE))              AS month_end,
       CAST(epoch(o_orderdate) AS BIGINT)               AS epoch_s
FROM orders
""",
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_add(d, 30).alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), d).alias("days_to_2002"),
        F.last_day(d).alias("month_end"),
        (F.unix_micros(F.col("o_orderdate").cast("timestamp")) / F.lit(1_000_000))
        .cast("long")
        .alias("epoch_s"),
    )


@query(
    "math_funcs",
    oracle="""
SELECT c_custkey,
       round(abs(c_acctbal), 2)                    AS bal_abs,
       CAST(ceil(c_acctbal) AS BIGINT)             AS bal_ceil,
       CAST(floor(c_acctbal) AS BIGINT)            AS bal_floor,
       round(c_acctbal, 1)                         AS bal_r1,
       round(sqrt(abs(c_acctbal)), 6)              AS bal_sqrt,
       round(power(c_acctbal / 1000, 2), 6)        AS bal_sq,
       CAST(mod(c_custkey, 7) AS BIGINT)           AS key_mod,
       CAST(sign(c_acctbal) AS DOUBLE)             AS bal_sign,
       round(ln(1 + abs(c_acctbal)), 6)            AS bal_ln,
       round(log10(1 + abs(c_acctbal)), 6)         AS bal_log10,
       round(greatest(c_acctbal, 0), 2)            AS bal_pos,
       round(least(c_acctbal, 0), 2)               AS bal_neg
FROM customer
""",
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.round(F.abs(bal), 2).alias("bal_abs"),
        F.ceil(bal).alias("bal_ceil"),
        F.floor(bal).alias("bal_floor"),
        F.round(bal, 1).alias("bal_r1"),
        F.round(F.sqrt(F.abs(bal)), 6).alias("bal_sqrt"),
        F.round(F.pow(bal / 1000, 2), 6).alias("bal_sq"),
        (F.col("c_custkey") % 7).alias("key_mod"),
        F.signum(bal).alias("bal_sign"),
        F.round(F.log(F.lit(1) + F.abs(bal)), 6).alias("bal_ln"),
        F.round(F.log10(F.lit(1) + F.abs(bal)), 6).alias("bal_log10"),
        F.round(F.greatest(bal, F.lit(0.0)), 2).alias("bal_pos"),
        F.round(F.least(bal, F.lit(0.0)), 2).alias("bal_neg"),
    )


@query(
    "array_funcs",
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS INT)                          AS dim,
       -- "+ 0" drops IEEE negative zero: DuckDB's round keeps the sign
       -- of a -tiny input (-0.00003 -> -0.0, stringified "-0.0") while
       -- Spark's BigDecimal HALF_UP round has no signed zero — first
       -- diverged on vec_id 1753 at sf0.1
       round(CAST(embedding[1] AS DOUBLE), 4) + 0           AS first_val,
       round(CAST(embedding[1] AS DOUBLE), 4) + 0           AS head_1,
       round(CAST(embedding[2] AS DOUBLE), 4) + 0           AS head_2,
       round(CAST(embedding[3] AS DOUBLE), 4) + 0           AS head_3,
       round(list_reduce([CAST(x AS DOUBLE) FOR x IN embedding],
                         (a, b) -> a + b), 4) + 0           AS vec_sum
FROM embeddings
""",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface incl. the HOFs the reference leans on (sequence/
    transform, pyspark_script.py:80-96): size, indexing, slice+transform,
    and aggregate (fold) — all JVM-side, no UDF.

    The slice+transform result is unpacked into scalar columns (head_1..3)
    rather than returned as an array: the driver's value-hash compare
    canonicalizes via pandas and can't hash array cells."""
    e = _t(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    head3 = F.transform(
        F.slice(emb, 1, 3), lambda x: F.round(x.cast("double"), 4)
    )
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.round(F.element_at(emb, 1).cast("double"), 4).alias("first_val"),
        F.element_at(head3, 1).alias("head_1"),
        F.element_at(head3, 2).alias("head_2"),
        F.element_at(head3, 3).alias("head_3"),
        F.round(
            F.aggregate(
                emb, F.lit(0.0), lambda acc, x: acc + x.cast("double")
            ),
            4,
        ).alias("vec_sum"),
    )


@query(
    "array_agg_funcs",
    oracle="""
SELECT label,
       array_to_string(list_sort(list(vec_id)), ',') AS vec_ids,
       CAST(count(*) AS BIGINT)                      AS n_vecs
FROM embeddings GROUP BY label
""",
)
def array_agg_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list + sort_array, serialized to a comma-joined string so the
    driver's pandas-based hash compare gets a hashable cell (integer string
    formatting is engine-stable; double formatting would not be)."""
    e = _t(spark, sf_dir, "embeddings")
    return e.groupBy("label").agg(
        F.array_join(F.sort_array(F.collect_list("vec_id")), ",").alias(
            "vec_ids"
        ),
        F.count(F.lit(1)).alias("n_vecs"),
    )


@query(
    "map_funcs",
    oracle="""
SELECT c_custkey,
       round(c_acctbal, 2)   AS bal_from_map,
       c_mktsegment          AS seg_from_map,
       'bal,seg'             AS map_keys_sorted
FROM customer
""",
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + element access + key listing. The oracle states the
    expected ground truth directly — the roundtrip through MapType is the
    Spark behavior under test."""
    c = _t(spark, sf_dir, "customer")
    m = F.create_map(
        F.lit("bal"), F.round("c_acctbal", 2).cast("string"),
        F.lit("seg"), F.col("c_mktsegment"),
    )
    return c.select(
        "c_custkey",
        F.element_at(m, "bal").cast("double").alias("bal_from_map"),
        F.element_at(m, "seg").alias("seg_from_map"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias(
            "map_keys_sorted"
        ),
    )


@query(
    "json_funcs",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_path,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_struct
FROM events
""",
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-as-string column access two ways: path extraction
    (get_json_object) and full parse to struct (from_json) — both JVM-side."""
    e = _t(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k INT")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_path"),
        parsed.getField("k").alias("k_struct"),
    )


@query(
    "case_null_funcs",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'neg'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'high' END                                    AS bal_band,
       coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER')    AS seg_or_other,
       CAST(c_acctbal IS NULL AS INT)                          AS bal_is_null,
       CAST(c_acctbal IS NOT NULL AS INT)                      AS bal_not_null
FROM customer
""",
)
def case_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.when(bal < 0, "neg").when(bal < 5000, "mid").otherwise("high").alias(
            "bal_band"
        ),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")
        ).alias("seg_or_other"),
        bal.isNull().cast("int").alias("bal_is_null"),
        bal.isNotNull().cast("int").alias("bal_not_null"),
    )


@query(
    "cast_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderkey AS VARCHAR)                    AS key_str,
       CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT)    AS key_roundtrip,
       CAST(floor(o_totalprice) AS BIGINT)            AS price_floor,
       CAST(o_orderdate AS DATE)                      AS odate,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR)     AS odate_str
FROM orders
""",
)
def cast_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("string").cast("long").alias("key_roundtrip"),
        F.floor("o_totalprice").alias("price_floor"),
        F.to_date("o_orderdate").alias("odate"),
        F.to_date("o_orderdate").cast("string").alias("odate_str"),
    )


@query(
    "array_hof_funcs",
    oracle="""
SELECT vec_id,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INT)   AS n_pos,
       len(list_filter(embedding, x -> x > 0.49)) > 0         AS any_big,
       len(list_filter(embedding, x -> abs(x) <= 0.5)) = len(embedding)
                                                              AS all_small,
       round(list_reduce(
           [abs(CAST(x AS DOUBLE)) FOR x IN embedding],
           (a, b) -> a + b), 4)                               AS l1_norm
FROM embeddings
""",
)
def array_hof_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions: filter / exists / forall / aggregate
    (fold). Fine OUTSIDE hot loops — each lambda evaluates interpreted
    (not codegen), so per-element work over thousands of rows is fine,
    per-element work x 64 permutations over documents is not (see
    operators/dedup.py for the explode+projection alternative)."""
    e = _t(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(F.filter(v, lambda x: x > 0)).alias("n_pos"),
        F.exists(v, lambda x: x > 0.49).alias("any_big"),
        F.forall(v, lambda x: F.abs(x) <= 0.5).alias("all_small"),
        F.round(
            F.aggregate(
                v, F.lit(0.0), lambda acc, x: acc + F.abs(x.cast("double"))
            ),
            4,
        ).alias("l1_norm"),
    )


@query(
    "variant_funcs",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT)    AS k_val,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_long,
       CASE WHEN json_extract(props, '$.missing') IS NULL
            THEN NULL ELSE 0 END                         AS missing_val
FROM events
""",
)
def variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VariantType: parse the JSON
    column once into a variant (a binary tree encoding — parsed once,
    fields accessed without re-tokenizing, unlike repeated
    get_json_object calls which re-parse per extraction), then typed
    variant_get path extraction, incl. a missing path returning NULL.
    The DuckDB oracle reads the same fields through its JSON engine."""
    e = _t(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_val"),
        F.variant_get(v, "$.k", "bigint").alias("k_long"),
        F.try_variant_get(v, "$.missing", "int").alias("missing_val"),
    )


@query(
    "try_funcs",
    oracle="""
SELECT c_custkey,
       round(c_acctbal / NULLIF(c_custkey % 3, 0), 6) AS safe_div,
       TRY_CAST(c_mktsegment AS INT)                  AS seg_as_int,
       CAST(c_custkey + 1 AS BIGINT)                  AS key_plus_1,
       string_split(c_name, ' ')[10]                  AS word_10
FROM customer
""",
)
def try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression family: try_divide (NULL on /0), try_cast
    (NULL on bad parse), try_add, try_element_at (NULL past the end) —
    the ANSI-mode-compatible way to keep a 100 TB job from dying on one
    malformed row. All JVM-side; the oracle reproduces each NULL contract
    with NULLIF / TRY_CAST / native out-of-bounds indexing."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.round(
            F.try_divide(F.col("c_acctbal"), F.col("c_custkey") % 3), 6
        ).alias("safe_div"),
        F.col("c_mktsegment").try_cast("int").alias("seg_as_int"),
        F.try_add(F.col("c_custkey"), F.lit(1)).alias("key_plus_1"),
        F.try_element_at(F.split("c_name", " "), F.lit(10)).alias("word_10"),
    )


@query(
    "generator_funcs",
    oracle="""
WITH w AS (
    SELECT p_partkey, string_split(p_name, ' ') AS words
    FROM part
)
SELECT p_partkey, CAST(i - 1 AS INT) AS pos, words[i] AS word
FROM w, UNNEST(generate_series(1, len(words))) AS t(i)
WHERE p_partkey % 10 <> 0
UNION ALL
SELECT p_partkey, NULL AS pos, NULL AS word
FROM w WHERE p_partkey % 10 = 0
""",
)
def generator_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator surface: posexplode_outer — rows whose array is NULL
    (every 10th part here) survive with NULL pos/word instead of being
    dropped, the null-preserving contract that matters when exploding
    optional nested data. The oracle constructs both branches explicitly."""
    p = _t(spark, sf_dir, "part")
    arr = F.when(
        F.col("p_partkey") % 10 != 0, F.split(F.col("p_name"), " ")
    )
    return p.select(
        "p_partkey", F.posexplode_outer(arr).alias("pos", "word")
    )


@query(
    "interval_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)  AS plus_3m,
       CAST(CAST(o_orderdate AS DATE) - INTERVAL 45 DAY AS DATE)   AS minus_45d,
       make_date(CAST(year(o_orderdate) AS INT),
                 CAST(month(o_orderdate) AS INT), 1)               AS month_floor,
       CAST(dayofyear(o_orderdate) AS INT)                         AS doy,
       CAST(weekofyear(o_orderdate) AS INT)                        AS iso_week,
       CAST(date_trunc('week', CAST(o_orderdate AS DATE)) AS DATE) AS week_start
FROM orders
""",
)
def interval_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-interval arithmetic: add_months (month-end clamped the same
    way in both engines), day offsets, make_date reconstruction, ISO
    day-of-year/week-of-year, and Monday-anchored week truncation."""
    o = _t(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.add_months(d, 3).alias("plus_3m"),
        F.date_sub(d, 45).alias("minus_45d"),
        F.make_date(F.year(d), F.month(d), F.lit(1)).alias("month_floor"),
        F.dayofyear(d).alias("doy"),
        F.weekofyear(d).alias("iso_week"),
        F.date_trunc("week", d).cast("date").alias("week_start"),
    )
