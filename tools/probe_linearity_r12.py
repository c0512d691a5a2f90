"""Round-12 5x linearity probe: the true-bits media codec rows.
multimodal_gif_frames (encode_gif -> sample_frames/gif_frame_fn ->
block-mean features) and the staged multimodal_wav_envelope
(encode_wav -> RIFF decode -> RMS envelope) are map-only mapInPandas
pipelines — per-doc Python kernels with no shuffle — so wall clock must
scale ~1:1 with corpus size. 1x = the sf0.1 documents table (5000
docs); 5x = the same corpus replicated with shifted ids. A superlinear
ratio would mean per-batch state leaking across rows (e.g. the frame
LRU thrashing) or a hidden wide operation.

    python tools/probe_linearity_r12.py
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from batch_processing_iac_aws_spark.plans import QUERIES  # noqa: E402
from batch_processing_iac_aws_spark.plans.registry import (  # noqa: E402
    STAGED_QUERIES,
)
from batch_processing_iac_aws_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"


def build_scaled(spark, factor: int) -> str:
    out = tempfile.mkdtemp(prefix=f"lin_r12_x{factor}_")
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    scaled = docs
    n = docs.count()
    for k in range(1, factor):
        scaled = scaled.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + k * 10 * n)
        )
    scaled.write.parquet(f"{out}/documents.parquet")
    return out


def main() -> None:
    spark = get_spark("lin_r12", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")
    fns = {
        "multimodal_gif_frames": QUERIES["multimodal_gif_frames"],
        "multimodal_wav_envelope": STAGED_QUERIES[
            "multimodal_wav_envelope"
        ],
    }
    dirs = {}
    for factor in (1, 5):
        dirs[factor] = build_scaled(spark, factor)
    try:
        for name, fn in fns.items():
            t = {}
            for factor in (1, 5):
                fn(spark, dirs[factor]).count()  # warm codegen/JIT
                t0 = time.perf_counter()
                rows = fn(spark, dirs[factor]).count()
                t[factor] = time.perf_counter() - t0
                print(
                    f"MARKER {name} x{factor}: {t[factor]:.2f}s "
                    f"({rows} rows)",
                    flush=True,
                )
            ratio = t[5] / t[1] / 5
            print(
                f"MARKER {name} 5x-linearity ratio: {ratio:.2f} "
                "(1.0 = perfectly linear)",
                flush=True,
            )
    finally:
        for d in dirs.values():
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
