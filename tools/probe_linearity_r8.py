"""5x scale-linearity probe for the round-8 additions: the quality-gate
logit projection, the refined-init IVF build + persisted IVF-PQ search,
residual IVFADC end-to-end, and the quality-gated ingest batch function.
Same protocol as probe_linearity.py: sf0.1 corpus vs a 5x replica
(offset ids, duplicate CONTENT — adversarial for dedup, neutral for
ANN/scoring). A healthy ratio is ~5x or below for corpus-linear ops;
index SEARCH should stay sublinear (probed cells grow, probe count
doesn't)."""
import os
import sys
import tempfile
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

from batch_processing_iac_aws_spark.operators.quality import (  # noqa: E402
    load_quality_weights,
    quality_logit_score,
)
from batch_processing_iac_aws_spark.operators.similarity import (  # noqa: E402
    attach_pq_codes,
    build_ivf_index,
    ivf_pq_index_topk,
    ivf_pq_residual_topk,
)
from batch_processing_iac_aws_spark.operators.text import (  # noqa: E402
    quality_features,
)
from batch_processing_iac_aws_spark.plans.registry import (  # noqa: E402
    fixture_path,
)
from batch_processing_iac_aws_spark.streaming.pipeline import (  # noqa: E402
    ingest_quality_batch,
)

_W = load_quality_weights(fixture_path("quality_weights.tsv"))


def t_quality_logit(d):
    return (
        quality_logit_score(quality_features(d), _W)
        .filter(F.col("quality_logit") >= 0)
        .count()
    )


def t_quality_ingest_batch(d):
    # one micro-batch of the seventh composition against a fresh dir —
    # gate + within-batch dedup + both writes (no prior index: measures
    # the per-batch corpus-linear path)
    base = tempfile.mkdtemp(prefix="lin_qingest_")
    ingest_quality_batch(
        d, 0, table_dir=f"{base}/t", index_dir=f"{base}/i", weights=_W
    )
    return spark.read.parquet(f"{base}/t").count()


def t_ivf_pq_build(e):
    # build + attach: the train-once path (corpus-linear by design)
    base = tempfile.mkdtemp(prefix="lin_ivfpq_")
    build_ivf_index(e, base, n_centroids=16, batch_id=0)
    attach_pq_codes(spark, base, m=16, n_codes=32, iters=3)
    return base


def t_ivf_pq_search(e, base):
    # the amortized search against the prebuilt index
    q = e.filter(F.col("vec_id") < 20)
    return ivf_pq_index_topk(
        spark, q, base, k=5, n_probe=4, shortlist=50
    ).count()


def t_residual(e):
    q = e.filter(F.col("vec_id") < 20)
    return ivf_pq_residual_topk(e, q, k=5, n_probe=4).count()


for name, fn, one, five in [
    ("quality_logit", t_quality_logit, docs1, docs5),
    ("quality_ingest_batch", t_quality_ingest_batch, docs1, docs5),
    ("ivfadc_residual", t_residual, emb1, emb5),
]:
    fn(one)  # warm
    t0 = time.time(); r1 = fn(one); t1 = time.time() - t0
    t0 = time.time(); r5 = fn(five); t5 = time.time() - t0
    print(
        f"MARKER {name}: 1x {t1:.2f}s ({r1}) 5x {t5:.2f}s ({r5}) "
        f"ratio {t5 / t1:.2f}x",
        flush=True,
    )

# build/search split for the persisted IVF-PQ: build should scale ~5x,
# search should scale SUBLINEARLY (cells grow, probe count doesn't)
t0 = time.time(); b1 = t_ivf_pq_build(emb1); tb1 = time.time() - t0
t0 = time.time(); b5 = t_ivf_pq_build(emb5); tb5 = time.time() - t0
t_ivf_pq_search(emb1, b1)  # warm
t0 = time.time(); s1 = t_ivf_pq_search(emb1, b1); ts1 = time.time() - t0
t0 = time.time(); s5 = t_ivf_pq_search(emb5, b5); ts5 = time.time() - t0
print(
    f"MARKER ivfpq_build: 1x {tb1:.2f}s 5x {tb5:.2f}s ratio {tb5/tb1:.2f}x",
    flush=True,
)
print(
    f"MARKER ivfpq_search: 1x {ts1:.2f}s ({s1}) 5x {ts5:.2f}s ({s5}) "
    f"ratio {ts5/ts1:.2f}x",
    flush=True,
)
spark.stop()
