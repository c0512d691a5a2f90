"""Round-15 same-epoch A/B timer: run named queries exactly the way
bench.py times them (construction + count inside the timed region, cold
then WARM_ITERS warm medians) and print one JSON line per query — run it
before and after a change, back to back on a quiet machine, and compare.

    python tools/ab_r15.py sf_dir name [name ...]
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from batch_processing_iac_aws_spark.plans import QUERIES  # noqa: E402
from batch_processing_iac_aws_spark.session import get_spark  # noqa: E402

WARM_ITERS = 3


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("ab_r15", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q6_forecast_revenue"](spark, sf_dir).count()
    out = {}
    for name in names:
        t0 = time.perf_counter()
        n = QUERIES[name](spark, sf_dir).count()
        cold = time.perf_counter() - t0
        samples = []
        for _ in range(WARM_ITERS):
            t1 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            samples.append(time.perf_counter() - t1)
        out[name] = {
            "cold": round(cold, 3),
            "warm": round(statistics.median(samples), 3),
            "spread": round(max(samples) - min(samples), 3),
            "rows": n,
        }
        print(f"MARKER {name}: {out[name]}", flush=True)
    print("ABJSON " + json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
