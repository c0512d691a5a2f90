"""5x scale-linearity probe for the round-4/5 additions: time each target
operator on the sf0.1 documents corpus and on a 5x-replicated copy (replica
doc_ids offset so they are distinct docs with duplicate CONTENT — the
adversarial case for dedup: every replica is a true near-duplicate)."""
import sys, time

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession
import pyspark.sql.functions as F

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
print("MARKER corpus sizes:", docs1.count(), docs5.count(), flush=True)

from batch_processing_iac_aws_spark.operators.dedup import (
    fuzzy_dedup_keep_one,
    incremental_fuzzy_dedup,
    minhash_signatures,
)


def t_fuzzy_pipeline(d):
    return fuzzy_dedup_keep_one(d, jaccard_threshold=0.9).count()


def t_incremental_fuzzy(d):
    history = d.filter(F.col("doc_id") % 5 == 0)
    batch = d.filter(F.col("doc_id") % 5 != 0)
    idx = minhash_signatures(history)
    return incremental_fuzzy_dedup(
        batch, idx, history=history, jaccard_threshold=0.9
    ).count()


t_fuzzy_pipeline(docs1)  # JVM/codegen warmup, untimed
for name, fn in [
    ("dedup_fuzzy_pipeline", t_fuzzy_pipeline),
    ("dedup_incremental_fuzzy", t_incremental_fuzzy),
]:
    for label, d in [("1x", docs1), ("5x", docs5), ("1x", docs1), ("5x", docs5)]:
        t0 = time.time()
        n = fn(d)
        print(f"MARKER {name} {label}: {time.time()-t0:.2f}s rows={n}", flush=True)

# pagerank: the query slices vec_id < 100 by design (bounded broadcast);
# the scaling axis is node/edge count, so probe 100 vs 500 nodes with the
# same plan shape (5x nodes => ~25x candidate pairs scored, more edges)
from batch_processing_iac_aws_spark.functions.vectors import cosine

SCALE = 1_000_000_000_000


def t_pagerank_nodes(n_nodes: int) -> tuple[float, int]:
    t0 = time.time()
    e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").filter(
        F.col("vec_id") < n_nodes
    )
    a = e.select(F.col("vec_id").alias("u"), F.col("embedding").alias("__va"))
    b = e.select(F.col("vec_id").alias("v"), F.col("embedding").alias("__vb"))
    e0 = (
        a.join(F.broadcast(b), F.col("u") < F.col("v"))
        .filter(F.round(cosine(F.col("__va"), F.col("__vb")), 6) >= 0.25)
        .select("u", "v")
    )
    edges = e0.unionAll(
        e0.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    nn = deg.agg(F.count(F.lit(1)).alias("n"))
    base = F.expr(f"(15 * ({SCALE} div n)) div 100")
    r = deg.crossJoin(F.broadcast(nn)).select(
        F.col("u").alias("node"), F.expr(f"{SCALE} div n").alias("r")
    )
    for _ in range(3):
        inflow = (
            edges.join(r, edges.u == r.node)
            .join(deg, "u")
            .groupBy("v")
            .agg(F.sum(F.expr("r div d")).alias("fl"))
        )
        r = inflow.crossJoin(F.broadcast(nn)).select(
            F.col("v").alias("node"),
            (base + F.expr("(85 * fl) div 100")).alias("r"),
        )
    n = r.count()
    return time.time() - t0, n


for n_nodes in [100, 500]:
    dt, n = t_pagerank_nodes(n_nodes)
    print(f"MARKER graph_pagerank nodes={n_nodes}: {dt:.2f}s rows={n}", flush=True)


# -- skew guard probe: boilerplate bomb vs max_bucket ------------------------
from batch_processing_iac_aws_spark.operators.dedup import minhash_lsh_candidates

bomb = spark.range(1_000_000, 1_001_000).select(
    F.col("id").alias("doc_id"),
    F.lit(
        "identical boilerplate template text repeated on every single "
        "page of the site"
    ).alias("text"),
)
poisoned = (
    docs1.select("doc_id", "text").unionByName(bomb).repartition(32).cache()
)
poisoned.count()
for label, kw in [("uncapped", {}), ("max_bucket=100", {"max_bucket": 100})]:
    t0 = time.time()
    n = minhash_lsh_candidates(poisoned, **kw).count()
    print(f"MARKER lsh bomb {label}: {time.time()-t0:.2f}s candidates={n}", flush=True)
t0 = time.time()
n = minhash_lsh_candidates(docs1).count()
print(f"MARKER lsh clean: {time.time()-t0:.2f}s candidates={n}", flush=True)


# -- round-5 additions: corpus line dedup (docs), SemDeDup + exact k-means
#    (embeddings; replicas are EXACT duplicate vectors — the adversarial
#    case for SemDeDup: every replica must drop) ------------------------
from batch_processing_iac_aws_spark.operators.dedup import semantic_dedup
from batch_processing_iac_aws_spark.operators.similarity import kmeans_exact
from batch_processing_iac_aws_spark.operators.text import (
    remove_boilerplate_segments,
)

emb1 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
max_vid = emb1.agg(F.max("vec_id")).first()[0] + 1
emb5 = emb1
for k in range(1, 5):
    emb5 = emb5.unionByName(
        emb1.withColumn("vec_id", F.col("vec_id") + F.lit(k * max_vid))
    )
emb5 = emb5.repartition(32).cache()
emb5.count()


def t_line_dedup(d):
    return remove_boilerplate_segments(
        d, segment_words=10, max_doc_freq=2
    ).count()


def t_semantic(e):
    return semantic_dedup(e, n_clusters=8, threshold=0.4).count()


def t_kmeans(e):
    return kmeans_exact(e, k=8, iters=2).count()


for name, fn, one, five in [
    ("corpus_line_dedup", t_line_dedup, docs1, docs5),
    ("dedup_semantic", t_semantic, emb1, emb5),
    ("cluster_kmeans", t_kmeans, emb1, emb5),
]:
    fn(one)  # warmup, untimed
    for label, d in [("1x", one), ("5x", five), ("1x", one), ("5x", five)]:
        t0 = time.time()
        n = fn(d)
        print(
            f"MARKER {name} {label}: {time.time()-t0:.2f}s rows={n}",
            flush=True,
        )
