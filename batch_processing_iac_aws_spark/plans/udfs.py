"""UDF surface (SURVEY.md §2B): vectorized pandas UDFs — scalar, grouped
aggregate (UDAF), and grouped map (applyInPandas). All Arrow-batched; the
row-at-a-time Python UDF exists in the API surface but is deliberately
absent from every registered query (tests/test_plans.py forbids
BatchEvalPython) — it's the documented slow path.

Each query here is chosen so the pandas computation has an exact SQL twin,
keeping the Python boundary oracle-checkable: geometric mean via
exp(avg(ln)), z-scores via window avg/stddev_samp.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf

from ..catalog import load_table
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _geomean_udfs():
    """pandas UDFs are created lazily INSIDE the query: a module-level
    @pandas_udf would re-execute when cloudpickle re-imports this module on
    the Python worker, where no SparkSession exists."""

    @pandas_udf("double")
    def geomean_1p(v: pd.Series) -> float:
        return float(
            np.exp(np.log1p(np.abs(v.to_numpy(dtype=np.float64))).mean())
        )

    @pandas_udf("long")
    def count_rows(v: pd.Series) -> int:
        return int(len(v))

    return geomean_1p, count_rows


@query(
    "udaf_geomean",
    oracle="""
SELECT event_type,
       round(exp(avg(ln(1 + abs(value)))), 6) AS geomean_1p,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY event_type
""",
)
def udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas UDAF (GROUPED_AGG) per event_type; numpy computes
    exp(mean(log1p(|v|))) inside Arrow batches, the oracle states the same
    formula in SQL — the Python boundary itself is what's under test."""
    e = _t(spark, sf_dir, "events")
    # a GROUPED_AGG pandas UDF can't share an agg with JVM aggregates —
    # count rides along as a second pandas aggregation instead
    geomean_1p, count_rows = _geomean_udfs()
    return e.groupBy("event_type").agg(
        F.round(geomean_1p("value"), 6).alias("geomean_1p"),
        count_rows("value").alias("n"),
    )


_ZSCORE_SCHEMA = "event_id bigint, user_id bigint, zscore double"


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    v = pdf["value"].to_numpy(dtype=np.float64)
    mean = v.mean()
    # ddof=1 == SQL stddev_samp; single-row groups yield NaN -> NULL,
    # matching SQL division by NULL
    std = v.std(ddof=1) if len(v) > 1 else float("nan")
    with np.errstate(divide="ignore", invalid="ignore"):
        z = (v - mean) / std
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "user_id": pdf["user_id"],
            "zscore": np.round(z, 4),
        }
    )


@query(
    "udf_grouped_zscore",
    oracle="""
SELECT event_id, user_id,
       round((value - avg(value) OVER w) / stddev_samp(value) OVER w, 4)
           AS zscore
FROM events
WINDOW w AS (PARTITION BY user_id)
""",
)
def udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-user z-score normalization — the
    canonical 'model-ish per-group transform' shape (one shuffle on the
    group key, pandas frame per group). Oracle is the identical window
    formula in SQL."""
    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return e.groupBy("user_id").applyInPandas(_zscore_group, _ZSCORE_SCHEMA)


@query(
    "udf_rowwise_python",
    oracle="""
SELECT c_custkey,
       reverse(CAST(c_custkey AS VARCHAR)) AS key_reversed,
       CAST(length(c_name) AS INT)         AS name_len
FROM customer
""",
)
def udf_rowwise_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — the SLOW path, registered to complete the
    UDF surface (SURVEY.md §2B), deliberately over the small dimension
    table. Each row round-trips driver JVM -> Python worker -> JVM with
    pickle serialization; at fact-table scale use pandas_udf (Arrow) or a
    builtin (reverse() exists JVM-side — this exact query needs no Python
    at all, which is the point the docstring makes)."""
    from pyspark.sql.functions import udf
    from pyspark.sql.types import StringType

    rev = udf(lambda k: str(k)[::-1], StringType())
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        rev(F.col("c_custkey")).alias("key_reversed"),
        F.length("c_name").cast("int").alias("name_len"),
    )


@query(
    "udtf_chunk_words",
    oracle="""
WITH w AS (
    SELECT doc_id, string_split_regex(text, '\\s+') AS ws
    FROM documents WHERE doc_id < 50
)
SELECT doc_id, CAST(t.i AS INT) AS chunk_idx,
       array_to_string(list_slice(ws, t.i * 10 + 1, t.i * 10 + 10), ' ')
           AS chunk
FROM w, UNNEST(generate_series(0, CAST(ceil(len(ws) / 10.0) AS BIGINT) - 1))
         AS t(i)
""",
)
def udtf_chunk_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 user-defined TABLE function): fan each document
    out into fixed 10-word chunks via a LATERAL call — the API for
    row-to-many-rows Python logic (tokenizer-with-overlap, document
    splitters) when no builtin generator fits. Row-wise Python like the
    rowwise demo: fine on bounded slices, Arrow/mapInPandas at corpus
    scale. The oracle rebuilds the same chunks with list slicing."""
    from pyspark.sql.functions import udtf

    from ..catalog import ensure_views

    # defined inside the query fn: cloudpickle re-imports this module on
    # the Python worker, where module-level Spark-dependent objects break
    @udtf(returnType="chunk_idx int, chunk string")
    class ChunkWords:
        def eval(self, text: str):
            if text is None:
                return
            words = text.split()
            for i in range(0, len(words), 10):
                yield i // 10, " ".join(words[i : i + 10])

    spark.udtf.register("chunk_words", ChunkWords)
    ensure_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT d.doc_id, t.chunk_idx, t.chunk
        FROM documents d, LATERAL chunk_words(d.text) t
        WHERE d.doc_id < 50
        """
    )
