"""Round-10 verdict item 2: loadavg-controlled rerun of the five queries
whose r9-end warm medians drifted 1.18-1.38x above the r8-end official
entry on untouched code. Protocol: one cold pass, then N warm
iterations per query back-to-back on an otherwise idle machine, median
+ spread + loadavg recorded. Compare against both official entries to
decide noise vs real.

    python tools/probe_drift_r10.py [iters]
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from batch_processing_iac_aws_spark.plans import QUERIES  # noqa: E402
from batch_processing_iac_aws_spark.session import get_spark  # noqa: E402

DRIFTERS = [
    "similarity_ivf_pq",          # r8-end 5.06 -> r9-end 7.00 (1.38x)
    "streaming_incremental_ann",  # 6.12 -> 8.24 (1.35x)
    "similarity_pq_rerank",       # 4.32 -> 5.35 (1.24x)
    "dedup_minhash",              # 5.44 -> 6.41 (1.18x)
    "docs_balanced_shards",       # 0.49 -> 0.67 (1.38x, small abs)
]
R8_END = {
    "similarity_ivf_pq": 5.06,
    "streaming_incremental_ann": 6.12,
    "similarity_pq_rerank": 4.32,
    "dedup_minhash": 5.44,
    "docs_balanced_shards": 0.49,
}


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("driftprobe", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"MARKER loadavg_start={os.getloadavg()}", flush=True)
    for name in DRIFTERS:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        cold = time.perf_counter() - t0
        samples = []
        for _ in range(iters):
            t1 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            samples.append(time.perf_counter() - t1)
        med = statistics.median(samples)
        print(
            f"MARKER {name}: cold {cold:.2f}s warm median {med:.2f}s "
            f"(min {min(samples):.2f} max {max(samples):.2f}, n={iters}) "
            f"r8_end {R8_END[name]:.2f}s ratio {med / R8_END[name]:.2f} "
            f"load {os.getloadavg()[0]:.1f}",
            flush=True,
        )
    print(f"MARKER loadavg_end={os.getloadavg()}", flush=True)


if __name__ == "__main__":
    main()
