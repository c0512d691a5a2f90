"""Ad-hoc oracle check for a NAMED subset of queries (same canon as
tools/probe_cross_sf.py) — fast feedback while iterating on a few plans:

    python tools/probe_subset.py sf_dir name [name ...]
"""

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from batch_processing_iac_aws_spark.catalog import TABLES  # noqa: E402
from batch_processing_iac_aws_spark.plans import ORACLES, QUERIES  # noqa: E402
from batch_processing_iac_aws_spark.session import get_spark  # noqa: E402
from tools.probe_cross_sf import canon  # noqa: E402


def main() -> int:
    sf = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("subset", cpus="16")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    bad = []
    for name in names:
        try:
            sdf = QUERIES[name](spark, sf).toPandas()
            if name not in ORACLES:
                print(f"MARKER {name}: rows-only, {len(sdf)} rows")
                continue
            odf = con.execute(ORACLES[name]).df()
            ok = (
                len(sdf) == len(odf)
                and sorted(map(str.lower, sdf.columns))
                == sorted(map(str.lower, odf.columns))
                and canon(sdf) == canon(odf)
            )
        except Exception as e:  # noqa: BLE001
            bad.append(name)
            print(f"MARKER FAIL {name}: ERROR {type(e).__name__}: {str(e)[:300]}")
            continue
        if ok:
            print(f"MARKER OK {name} ({len(sdf)} rows)")
        else:
            bad.append(name)
            print(f"MARKER FAIL {name}: rows {len(sdf)}/{len(odf)}")
    print("MARKER RESULT:", "ALL GREEN" if not bad else f"{len(bad)} failures")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
