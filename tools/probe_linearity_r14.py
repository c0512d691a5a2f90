"""Round-14 5x linearity probe: the G.711 telephony row and the two
round-15 staged rows. multimodal_g711_telephony and
multimodal_avi_rgb_frames are map-only mapInPandas pipelines (encode ->
real decode -> scalar features), so wall clock must scale ~1:1 with
corpus size; multimodal_audio_shift_near_dup adds the banded pigeonhole
pair join — near-linear on a corpus whose signatures do not collapse
(replica text is perturbed so band buckets stay honest). A superlinear
ratio in the map-only rows would mean a hidden wide op or codec-cache
thrash; in the near-dup row, a band-bucket collapse.
(table_objectstore_ingest is excluded by design: its wall time is the
streaming-engine lifecycle machinery, fixed per invocation — the same
verdict the r13 plan audit recorded for the streaming family.)

    python tools/probe_linearity_r14.py
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
    out = tempfile.mkdtemp(prefix=f"lin_r14_x{factor}_")
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    scaled = docs
    n = docs.count()
    for k in range(1, factor):
        # shift ids AND perturb text so replicas don't collapse into
        # one giant phash band bucket
        scaled = scaled.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + k * 10 * n)
            .withColumn("text", F.concat(F.col("text"), F.lit(f" v{k}")))
        )
    scaled.write.parquet(f"{out}/documents.parquet")
    return out


def main() -> None:
    spark = get_spark("lin_r14", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")
    fns = {
        "multimodal_g711_telephony": QUERIES["multimodal_g711_telephony"],
        "multimodal_avi_rgb_frames": STAGED_QUERIES[
            "multimodal_avi_rgb_frames"
        ],
        "multimodal_audio_shift_near_dup": STAGED_QUERIES[
            "multimodal_audio_shift_near_dup"
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
        spark.stop()


if __name__ == "__main__":
    main()
