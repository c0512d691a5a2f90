"""5x scale-linearity probe for the round-7 additions: band-key-Bloom
prefiltered incremental fuzzy dedup, PQ train/encode/ADC+rerank search,
and BPE token counting through the seam. Same protocol as
probe_linearity.py: sf0.1 corpus vs a 5x replica (offset ids, duplicate
CONTENT — adversarial for dedup, neutral for ANN/tokenization)."""
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

from batch_processing_iac_aws_spark.operators.dedup import (  # noqa: E402
    banded_signatures,
    build_band_bloom_index,
    incremental_fuzzy_dedup,
    minhash_signatures,
)
from batch_processing_iac_aws_spark.operators.similarity import (  # noqa: E402
    brute_force_topk,
    pq_encode,
    pq_rerank_topk,
    pq_train,
)
from batch_processing_iac_aws_spark.operators.text import (  # noqa: E402
    count_tokens,
    hashed_doc_vectors,
    load_bpe_merges,
    make_bpe_tokenizer,
)
from batch_processing_iac_aws_spark.operators.similarity import (  # noqa: E402
    sparse_cosine_knn,
)
from batch_processing_iac_aws_spark.operators.dedup import (  # noqa: E402
    incremental_sparse_dedup,
)


def t_fuzzy_bloom(d):
    history = d.filter(F.col("doc_id") % 5 == 0)
    batch = d.filter(F.col("doc_id") % 5 != 0)
    idx = banded_signatures(
        minhash_signatures(history, id_col="doc_id", text_col="text"),
        id_col="doc_id",
    ).select("doc_id", "band_idx", "band_hash")
    bloom = build_band_bloom_index(idx, m_bits=1 << 16, n_hashes=4)
    return incremental_fuzzy_dedup(
        batch, idx, history=history, jaccard_threshold=0.9,
        band_bloom=bloom, bloom_m_bits=1 << 16, bloom_n_hashes=4,
    ).count()


def t_pq(e):
    cbs = pq_train(e, m=16, k=32, iters=3)
    codes = pq_encode(e, cbs)
    q = e.filter(F.col("vec_id") < 20)
    return pq_rerank_topk(e, codes, cbs, q, k=5, shortlist=50).count()


def t_pq_exact_baseline(e):
    q = e.filter(F.col("vec_id") < 20)
    return brute_force_topk(e, q, k=5).count()


_tok = make_bpe_tokenizer(load_bpe_merges("/root/repo/fixtures/bpe_merges.txt"))


def t_bpe(d):
    return (
        count_tokens(d, text_col="text", tokenize_fn=_tok)
        .agg(F.sum("n_tokens"))
        .first()[0]
    )


def t_sparse_knn(d):
    # bounded probe set over the full corpus — the registered shape
    vecs = hashed_doc_vectors(d, dim=4096)
    qids = d.filter(F.col("doc_id") < 10).select(F.col("doc_id").alias("id"))
    return sparse_cosine_knn(vecs, qids, k=3).count()


def t_sparse_incr(d):
    # bounded fixture (the registered query's doc_id cap) replicated 5x
    # via modulo so the 5x corpus contributes 5x batches of the same size
    dd = d.filter(F.col("doc_id") % 100000 < 1000)
    history = dd.filter(F.col("doc_id") % 5 == 0)
    batch = dd.filter(F.col("doc_id") % 5 != 0)
    idx = hashed_doc_vectors(history, dim=4096)
    return incremental_sparse_dedup(
        batch, idx, dim=4096, threshold=0.95
    ).count()


for name, fn, one, five in [
    ("fuzzy_bloom", t_fuzzy_bloom, docs1, docs5),
    ("sparse_knn", t_sparse_knn, docs1, docs5),
    ("sparse_incremental", t_sparse_incr, docs1, docs5),
    ("pq_rerank", t_pq, emb1, emb5),
    ("pq_exact_baseline", t_pq_exact_baseline, emb1, emb5),
    ("bpe_count", t_bpe, docs1, docs5),
]:
    fn(one)  # warm
    t0 = time.time(); r1 = fn(one); t1 = time.time() - t0
    t0 = time.time(); r5 = fn(five); t5 = time.time() - t0
    print(
        f"MARKER {name}: 1x {t1:.2f}s ({r1}) 5x {t5:.2f}s ({r5}) "
        f"ratio {t5 / t1:.2f}x",
        flush=True,
    )
