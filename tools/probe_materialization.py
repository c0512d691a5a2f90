"""Measure verified_near_duplicates materialization strategies at sf0.1:
(a) current: localCheckpoint the candidate pairs
(b) cache() the candidate pairs (lazy, no plan-time materialization)
(c) no candidate materialization at all (sig is cached inside lsh_candidates)
Each timed cold-ish (fresh frame build) then warm (second run).
"""
import sys, time

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession
import pyspark.sql.functions as F

spark = (
    SparkSession.builder.master("local[16]")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from batch_processing_iac_aws_spark.operators.dedup import (
    exact_jaccard,
    minhash_lsh_candidates,
)

docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")


def run(strategy: str) -> float:
    t0 = time.time()
    cands = minhash_lsh_candidates(docs).select("id_a", "id_b")
    if strategy == "checkpoint":
        cands = cands.localCheckpoint()
    elif strategy == "cache":
        cands = cands.cache()
    out = exact_jaccard(docs, cands).filter(F.col("jaccard") >= 0.9)
    n = out.count()
    dt = time.time() - t0
    if strategy == "cache":
        cands.unpersist()
    spark.catalog.clearCache()
    return dt, n


for strategy in ["none", "cache", "checkpoint"] * 4:
    dt, n = run(strategy)
    print(f"MARKER {strategy}: {dt:.2f}s rows={n}", flush=True)
