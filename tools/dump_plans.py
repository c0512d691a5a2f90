"""Dump .explain("formatted") for named queries to plans/r14/<name>_<tag>.txt
(guide §7.2): the before/after plan evidence for the optimization round.

    python tools/dump_plans.py sf_dir tag name [name ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from batch_processing_iac_aws_spark.plans import QUERIES  # noqa: E402
from batch_processing_iac_aws_spark.session import get_spark  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", os.environ.get("PLANS_TAG_DIR", "r15"))


def main() -> None:
    sf_dir, tag, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("dump_plans", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        print(
            f"MARKER {name}: {path} ({n_ex} Exchange, "
            f"{plan.count('SortMergeJoin')} SMJ, "
            f"{plan.count('BroadcastHashJoin')} BHJ, "
            f"{plan.count('BatchEvalPython')} BatchEvalPython, "
            f"{plan.count('ArrowEvalPython')} ArrowEvalPython, "
            f"{plan.count('MapInPandas')} MapInPandas)"
        )


if __name__ == "__main__":
    main()
