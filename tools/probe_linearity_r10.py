"""Round-10 5x linearity probe: the store-backed ingest path (the
round-10 migration routed every composition's TABLE write through the
generationed store) and table compaction. Each scale runs the full
3-batch ingest_dedup_batch sequence into fresh stores, then
compact_table(upto=1); wall clock per stage, 1x vs 5x docs (sf0.1
corpus replicated with shifted ids — duplicates injected at the same
rate so the anti-join does real work at both scales).

    python tools/probe_linearity_r10.py
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from batch_processing_iac_aws_spark.operators.index_store import (  # noqa: E402
    compact_table,
    read_table,
)
from batch_processing_iac_aws_spark.session import get_spark  # noqa: E402
from batch_processing_iac_aws_spark.streaming.pipeline import (  # noqa: E402
    ingest_dedup_batch,
)


def run_scale(spark, docs, label):
    base = tempfile.mkdtemp(prefix=f"lin_r10_{label}_")
    table, idx = f"{base}/table", f"{base}/idx"
    t0 = time.perf_counter()
    for b in range(3):
        ingest_dedup_batch(
            docs.filter(F.col("doc_id") % 3 == b), b,
            table_dir=table, index_dir=idx,
        )
    t_ingest = time.perf_counter() - t0
    t1 = time.perf_counter()
    audit = compact_table(spark, table, upto_batch=1)
    t_compact = time.perf_counter() - t1
    rows = read_table(spark, table).count()
    shutil.rmtree(base, ignore_errors=True)
    return t_ingest, t_compact, rows, audit["files_before"], audit["files_after"]


def main() -> None:
    spark = get_spark("lin_r10", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")
    d1 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    # 5x, two shapes: (a) DUP — replicas keep the base text, so the 5x
    # input is 80% known content and the anti-join/keep-first does the
    # dropping (the realistic re-crawl profile; survivors stay 1x);
    # (b) NEW — replicas get distinct text, so survivors AND both store
    # writes grow 5x (the cold-corpus growth profile).
    d5_dup = d1
    d5_new = d1
    for k in range(1, 5):
        shifted = d1.select(
            (F.col("doc_id") + 1000000 * k).alias("doc_id"), "text"
        )
        d5_dup = d5_dup.unionByName(shifted)
        d5_new = d5_new.unionByName(
            shifted.withColumn("text", F.concat("text", F.lit(f" r{k}")))
        )
    d1 = d1.localCheckpoint(eager=True)
    d5_dup = d5_dup.localCheckpoint(eager=True)
    d5_new = d5_new.localCheckpoint(eager=True)
    for _ in range(2):  # first round warms codegen; report the second
        r1 = run_scale(spark, d1, "x1")
        rd = run_scale(spark, d5_dup, "x5dup")
        rn = run_scale(spark, d5_new, "x5new")
    for label, r in (("x1", r1), ("x5_dup", rd), ("x5_new", rn)):
        print(
            f"MARKER {label}: ingest {r[0]:.2f}s compact {r[1]:.2f}s "
            f"rows {r[2]} files {r[3]}->{r[4]}", flush=True,
        )
    print(
        f"MARKER ratios at 5x docs: ingest dup {rd[0]/r1[0]:.2f}x "
        f"new {rn[0]/r1[0]:.2f}x; compact dup {rd[1]/r1[1]:.2f}x "
        f"new {rn[1]/r1[1]:.2f}x", flush=True,
    )


if __name__ == "__main__":
    main()
