"""Hash-prove STAGED pairs against DuckDB across SFs (the staging
ledger's bar before any flip):

    python tools/probe_staged.py name [sf_dir ...]

Defaults to all three testdata SFs."""

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from batch_processing_iac_aws_spark.catalog import TABLES  # noqa: E402
from batch_processing_iac_aws_spark.plans.registry import (  # noqa: E402
    STAGED_ORACLES,
    STAGED_QUERIES,
)
from batch_processing_iac_aws_spark.session import get_spark  # noqa: E402
from tools.probe_cross_sf import canon  # noqa: E402


def main() -> int:
    name = sys.argv[1]
    sfs = sys.argv[2:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = get_spark("staged-probe", cpus="16")
    spark.sparkContext.setLogLevel("ERROR")
    bad = 0
    for sf in sfs:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
            )
        sdf = STAGED_QUERIES[name](spark, sf).toPandas()
        odf = con.execute(STAGED_ORACLES[name]).df()
        ok = (
            len(sdf) == len(odf)
            and sorted(map(str.lower, sdf.columns))
            == sorted(map(str.lower, odf.columns))
            and canon(sdf) == canon(odf)
        )
        bad += 0 if ok else 1
        print(
            f"MARKER {sf}: {'OK' if ok else 'FAIL'} "
            f"({len(sdf)}/{len(odf)} rows)",
            flush=True,
        )
    spark.stop()
    print("MARKER DONE", "ALL GREEN" if not bad else f"{bad} FAILURES")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
