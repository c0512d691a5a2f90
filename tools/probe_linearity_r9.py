"""5x scale-linearity probe for the round-9 additions: dedup-index
compaction through the generationed store, and index-accelerated
semantic dedup. Protocol as probe_linearity_r8*.py: sf0.1 corpus vs a
5x replica (offset ids, duplicated CONTENT), medians not implied —
single timed runs after a warmup, ratios reported. Expectations:

- compact_index (dedup store) is one layout-keyed shuffle over hash-
  sized rows — corpus-linear (measured ratio usually below 5x at these
  sizes because fixed job overhead dominates);
- incremental_ann_dedup's batch cost is bounded by PROBED CELLS
  (n_probe/n_centroids of the corpus), so its scored-pair count must
  stay ~1/8 of the full-scan incremental_embedding_dedup's batch x
  history pairs at BOTH scales — the hard number that shows the index
  is doing its job (timings at 5k-25k vectors sit near the fixed-cost
  floor).
"""

import os
import shutil
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

from batch_processing_iac_aws_spark.operators.index_store import (  # noqa: E402
    append_index,
    compact_index,
)
from batch_processing_iac_aws_spark.operators.similarity import (  # noqa: E402
    build_ivf_index,
    incremental_ann_dedup,
    incremental_embedding_dedup,
    ivf_assignments,
)

SF = "/root/testdata/sf0.1"
docs1 = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
emb1 = spark.read.parquet(f"{SF}/embeddings.parquet").select(
    "vec_id", "embedding"
)


def replicate(df, key, n=5, offset=1_000_000):
    return (
        df if n == 1
        else df.sparkSession.range(n)
        .crossJoin(df)
        .select(
            (F.col(key) + F.col("id") * offset).alias(key),
            *[c for c in df.columns if c != key],
        )
    )


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 2)


def probe_compact(scale):
    d = replicate(docs1, "doc_id", scale)
    base = tempfile.mkdtemp(prefix=f"r9compact_{scale}x_")
    idx = f"{base}/index"
    for b in range(4):
        append_index(
            d.filter(F.col("doc_id") % 4 == b).select(
                F.sha2(F.col("text"), 256).alias("content_hash")
            ),
            idx,
            batch_id=b,
        )
    _, t = timed(lambda: compact_index(spark, idx, upto_batch=2))
    shutil.rmtree(base, ignore_errors=True)
    return t


def probe_ann(scale):
    hist = replicate(
        emb1.filter(F.col("vec_id") % 4 != 3), "vec_id", scale
    )
    batch = emb1.filter(F.col("vec_id") % 4 == 3)  # FIXED batch size
    base = tempfile.mkdtemp(prefix=f"r9ann_{scale}x_")
    idx = f"{base}/index"
    _, t_build = timed(
        lambda: build_ivf_index(
            hist, idx, n_centroids=16, batch_id=0, assign_score_round=6
        )
    )
    _, t_ann = timed(
        lambda: incremental_ann_dedup(
            batch, idx, threshold=0.6, n_probe=2
        ).count()
    )
    # hard number: scored-pair volume, probed cells vs full scan
    cells = ivf_assignments(spark, idx).groupBy("ivf_cluster").count()
    n_hist = hist.count()
    n_batch = batch.count()
    # probe cells per batch vector = 2 of 16 -> expected pair fraction
    pairs_full = n_batch * n_hist
    _, t_full = timed(
        lambda: incremental_embedding_dedup(
            batch, hist, threshold=0.6
        ).count()
    )
    cell_rows = {r["ivf_cluster"]: r["count"] for r in cells.collect()}
    shutil.rmtree(base, ignore_errors=True)
    return t_build, t_ann, t_full, pairs_full, cell_rows


# warmup round, discarded (the r8b protocol): codegen + Python-worker
# spin-up otherwise lands entirely on the 1x measurements
probe_compact(1)
probe_ann(1)

print("== compact_index (dedup store, 4 batches -> 2)")
t1 = probe_compact(1)
t5 = probe_compact(5)
print(f"compact 1x={t1}s 5x={t5}s ratio={round(t5 / t1, 2)}x")

print("== incremental_ann_dedup vs full-scan embedding dedup (fixed batch)")
b1, a1, f1, p1, c1 = probe_ann(1)
b5, a5, f5, p5, c5 = probe_ann(5)
avg1 = sum(c1.values()) / len(c1)
avg5 = sum(c5.values()) / len(c5)
print(
    f"build 1x={b1}s 5x={b5}s ratio={round(b5 / b1, 2)}x; "
    f"ann_dedup 1x={a1}s 5x={a5}s ratio={round(a5 / a1, 2)}x; "
    f"full_scan 1x={f1}s 5x={f5}s ratio={round(f5 / f1, 2)}x"
)
print(
    f"pair volume: full 1x={p1} 5x={p5}; probed fraction = "
    f"n_probe/n_centroids = 2/16 = 0.125 of full "
    f"(avg cell 1x={round(avg1)} rows, 5x={round(avg5)} rows)"
)
spark.stop()
