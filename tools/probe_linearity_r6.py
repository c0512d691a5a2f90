"""5x scale-linearity probe for the round-6 additions: bloom-prefiltered
ingest, token-balanced sharding, quality-aware keep-best dedup, and the
persisted-index IVF build+append+search path. Same protocol as
probe_linearity.py: sf0.1 corpus vs a 5x replica (offset ids, duplicate
CONTENT — adversarial for dedup, neutral for layout/ANN ops)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import pyspark.sql.functions as F
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.driver.memory", "24g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

docs1 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
max_id = docs1.agg(F.max("doc_id")).first()[0] + 1
docs5 = docs1
for k in range(1, 5):
    docs5 = docs5.unionByName(
        docs1.withColumn("doc_id", F.col("doc_id") + F.lit(k * max_id))
    )
docs5 = docs5.repartition(32).cache()

emb1 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
max_vid = emb1.agg(F.max("vec_id")).first()[0] + 1
emb5 = emb1
for k in range(1, 5):
    emb5 = emb5.unionByName(
        emb1.withColumn("vec_id", F.col("vec_id") + F.lit(k * max_vid))
    )
emb5 = emb5.repartition(32).cache()
print(
    "MARKER sizes docs:", docs1.count(), docs5.count(),
    "emb:", emb1.count(), emb5.count(), flush=True,
)

from batch_processing_iac_aws_spark.operators.corpus import balanced_shards
from batch_processing_iac_aws_spark.operators.dedup import (
    bloom_prefilter_dedup,
    build_bloom_index,
    fuzzy_dedup_keep_best,
)
from batch_processing_iac_aws_spark.operators.similarity import (
    append_to_ivf_index,
    build_ivf_index,
    ivf_index_topk,
)


def t_bloom(d):
    history = d.filter(F.col("doc_id") % 5 == 0)
    batch = d.filter(F.col("doc_id") % 5 != 0)
    index = history.select(
        F.sha2(F.col("text"), 256).alias("content_hash")
    ).distinct()
    bloom = build_bloom_index(history, m_bits=1 << 18, n_hashes=4)
    return bloom_prefilter_dedup(
        batch, index, bloom, m_bits=1 << 18, n_hashes=4
    ).count()


def t_shards(d):
    w = d.select(
        "doc_id", F.size(F.split("text", r"\s+")).cast("long").alias("w")
    )
    return balanced_shards(
        w, weight_col="w", id_col="doc_id", n_shards=32
    ).count()


def t_keep_best(d):
    return fuzzy_dedup_keep_best(
        d, quality_col="n_chars", jaccard_threshold=0.9
    ).count()


def t_ivf(e):
    import tempfile

    base = tempfile.mkdtemp(prefix="lin_ivf_")
    history = e.filter(F.col("vec_id") % 4 != 3)
    batch = e.filter(F.col("vec_id") % 4 == 3)
    build_ivf_index(history, base, n_centroids=16, batch_id=0)
    append_to_ivf_index(
        batch, base, batch_id=1, drift_floor=-0.5, max_drift_frac=0.5
    )
    q = e.filter(F.col("vec_id") < 20)
    return ivf_index_topk(spark, q, base, k=5, n_probe=4).count()


t_bloom(docs1)  # warmup, untimed
for name, fn, one, five in [
    ("dedup_bloom_prefilter", t_bloom, docs1, docs5),
    ("docs_balanced_shards", t_shards, docs1, docs5),
    ("dedup_keep_best", t_keep_best, docs1, docs5),
    ("similarity_incremental", t_ivf, emb1, emb5),
]:
    for label, d in [("1x", one), ("5x", five), ("1x", one), ("5x", five)]:
        t0 = time.time()
        n = fn(d)
        print(f"MARKER {name} {label}: {time.time()-t0:.2f}s rows={n}", flush=True)
