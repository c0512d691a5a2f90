"""5x scale-linearity probe for the round-8 second wave: persisted-index
compaction and perceptual-hash media near-dup. Same protocol as
probe_linearity_r8.py: sf0.1 corpus vs a 5x replica (offset ids,
duplicated CONTENT). Expectations:

- compact_ivf_index is one layout-keyed shuffle over the assignments —
  corpus-linear (~5x or below; fixed job overhead usually pulls the
  measured ratio under 5x at these sizes);
- post-compaction search should beat pre-compaction search at BOTH
  scales (fewer files per probed cell), and its cost must stay
  sublinear in corpus size (cell pruning);
- multimodal_phash_pairs' hash side is map-only + one per-media window;
  the band join grows with bucket occupancy — 32-bit hashes over 5x
  near-random content stay collision-sparse, so ~linear overall.
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import pyspark.sql.functions as F
from pyspark.sql import SparkSession, Window as W

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.driver.memory", "24g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from batch_processing_iac_aws_spark.operators.dedup import (  # noqa: E402
    hamming_band_pairs,
)
from batch_processing_iac_aws_spark.operators.similarity import (  # noqa: E402
    append_to_ivf_index,
    build_ivf_index,
    compact_ivf_index,
    ivf_index_topk,
)
from batch_processing_iac_aws_spark.plans.llm import _md5_lower60  # noqa: E402
from batch_processing_iac_aws_spark.operators.multimodal import (  # noqa: E402
    text_as_media,
)

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


def bench_compact(emb, tag):
    root = tempfile.mkdtemp(prefix=f"lin_compact_{tag}_")
    idx = f"{root}/ivf"
    build_ivf_index(
        emb.filter(F.col("vec_id") % 4 == 0), idx,
        n_centroids=16, batch_id=0,
    )
    for b in (1, 2, 3):
        append_to_ivf_index(
            emb.filter(F.col("vec_id") % 4 == b), idx, batch_id=b
        )
    q = emb.filter(F.col("vec_id") < 20)
    t0 = time.time()
    pre = ivf_index_topk(spark, q, idx, k=5, n_probe=4).count()
    t_pre = time.time() - t0
    t0 = time.time()
    audit = compact_ivf_index(spark, idx, upto_batch=2)
    t_c = time.time() - t0
    t0 = time.time()
    post = ivf_index_topk(spark, q, idx, k=5, n_probe=4).count()
    t_post = time.time() - t0
    assert pre == post
    print(
        f"MARKER compact {tag}: compact={t_c:.2f}s "
        f"search_pre={t_pre:.2f}s search_post={t_post:.2f}s "
        f"files {audit['files_before']}->{audit['files_after']}",
        flush=True,
    )
    shutil.rmtree(root, ignore_errors=True)
    return t_c, t_pre, t_post


def bench_phash(docs, tag):
    media = text_as_media(docs.select("doc_id", "text"))
    ps = F.col("payload").cast("string")
    feats = F.array(
        *[
            (_md5_lower60(F.concat(ps, F.lit(f":{j}"))) % 256).cast("double")
            for j in range(32)
        ]
    )
    t0 = time.time()
    f = media.select("media_id", F.posexplode(feats).alias("j", "v"))
    sig = (
        f.withColumn("s", F.sum("v").over(W.partitionBy("media_id")))
        .groupBy("media_id")
        .agg(
            F.sum(
                F.when(
                    F.col("v") * 32 > F.col("s"),
                    F.pow(F.lit(2.0), F.col("j")).cast("long"),
                ).otherwise(F.lit(0))
            ).alias("phash")
        )
        .cache()
    )
    n = hamming_band_pairs(
        sig, id_col="media_id", hash_col="phash", bits=32, max_hamming=2,
        id_a="media_id_a", id_b="media_id_b",
    ).count()
    dt = time.time() - t0
    sig.unpersist()
    print(f"MARKER phash {tag}: {dt:.2f}s pairs={n}", flush=True)
    return dt


# warmup round: the first build/search/band-join of a session pays JVM +
# codegen costs that would otherwise be billed to the 1x run (measured
# 5x ratios BELOW 1 without this)
bench_compact(emb1, "warmup")
bench_phash(docs1, "warmup")

c1 = bench_compact(emb1, "1x")
c5 = bench_compact(emb5, "5x")
print(
    f"MARKER compact ratio: compact {c5[0]/c1[0]:.2f}x "
    f"search_post {c5[2]/c1[2]:.2f}x",
    flush=True,
)
p1 = bench_phash(docs1, "1x")
p5 = bench_phash(docs5, "5x")
print(f"MARKER phash ratio: {p5/p1:.2f}x", flush=True)
spark.stop()
