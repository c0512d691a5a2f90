"""Round-11 5x linearity probe: the IN-BAND auto-compaction policy.
Each scale runs the 6-batch ingest_dedup_batch sequence with the
metadata-only trigger fused before every batch (the exact
_maybe_auto_compact call path, auto_compact_batches=2), so compaction
fires BY POLICY mid-sequence — plus a trigger-cost isolation loop:
1000 below-threshold compact_if_needed calls, which after the round-11
fix must cost microseconds each (directory listing), independent of
corpus size. Wall clock 1x vs 5x docs (sf0.1 corpus replicated with
shifted ids, duplicates at the same rate).

    python tools/probe_linearity_r11.py
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from batch_processing_iac_aws_spark.operators.index_store import (  # noqa: E402
    compact_if_needed,
    read_table,
    store_current,
    store_watermark,
)
from batch_processing_iac_aws_spark.session import get_spark  # noqa: E402
from batch_processing_iac_aws_spark.streaming.pipeline import (  # noqa: E402
    _maybe_auto_compact,
    ingest_dedup_batch,
)


def run_scale(spark, docs, label):
    base = tempfile.mkdtemp(prefix=f"lin_r11_{label}_")
    table, idx = f"{base}/table", f"{base}/idx"
    t0 = time.perf_counter()
    for b in range(6):
        _maybe_auto_compact(spark, (table, idx), b, 2)
        ingest_dedup_batch(
            docs.filter(F.col("doc_id") % 6 == b), b,
            table_dir=table, index_dir=idx,
        )
    t_ingest = time.perf_counter() - t0
    wm = store_watermark(store_current(table))
    # trigger-cost isolation: 1000 below-threshold checks on the LIVE
    # store — must be corpus-size-independent after the metadata-only fix
    t1 = time.perf_counter()
    for _ in range(1000):
        assert (
            compact_if_needed(
                None, table, committed_upto=wm or 0, max_batches=64
            )
            is None
        )
    t_trigger = (time.perf_counter() - t1) / 1000
    rows = read_table(spark, table).count()
    shutil.rmtree(base, ignore_errors=True)
    return t_ingest, t_trigger, rows, wm


def main() -> None:
    spark = get_spark("lin_r11", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")
    d1 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    # 5x, two shapes (the r10 probe's profiles adapted to 6 batches):
    # (a) DUP — replicas keep the base text AND its batch class (shift by
    # a multiple of 6), so every batch still lands base survivors while
    # the keep-first/anti-join drops 4x known content; (b) NEW —
    # replicas get distinct text, so survivors and both store writes
    # grow 5x. The naive +1M shift is a TRAP here: 1M % 6 != 0 moves
    # every replica's batch residue and batches 2-5 end up with zero
    # survivors — an empty micro-batch writes no partition, the store
    # never crosses the threshold, and the policy never fires.
    d5_dup = d1
    d5_new = d1
    for k in range(1, 5):
        shifted = d1.select(
            (F.col("doc_id") + 6_000_000 * k).alias("doc_id"), "text"
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
            f"MARKER {label}: ingest+policy {r[0]:.2f}s "
            f"trigger-noop {r[1]*1e6:.0f}us rows {r[2]} watermark {r[3]}",
            flush=True,
        )
        assert r[3] is not None, f"{label}: policy never fired"
    print(
        f"MARKER ratios at 5x docs: ingest+policy dup {rd[0]/r1[0]:.2f}x "
        f"new {rn[0]/r1[0]:.2f}x; trigger-noop dup {rd[1]/r1[1]:.2f}x "
        f"new {rn[1]/r1[1]:.2f}x "
        f"(metadata-only => ~1.0x regardless of corpus)", flush=True,
    )


if __name__ == "__main__":
    main()
