"""Cross-SF oracle sweep: run EVERY registered oracle pair at a scale
factor the driver does not use (default sf0.001) and compare exactly,
mirroring tests/test_oracle.py's canonicalization. The per-round driver
gate runs at sf0.01 only; a query hardcoding row counts, id ranges, or
thresholds tuned to that SF would pass it while being wrong everywhere
else — this sweep is the guard. Run ad hoc (it would double the suite's
wall time if it lived in tests/):

    python tools/probe_cross_sf.py [sf_dir]

Round-5 result: 182/182 green at sf0.001. Round-6 result: 188/188 green
at sf0.001 (and tests/test_oracle.py holds all 188 green at sf0.01,
spot checks at sf0.1).
"""

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from batch_processing_iac_aws_spark.catalog import TABLES  # noqa: E402
from batch_processing_iac_aws_spark.plans import ORACLES, QUERIES  # noqa: E402
from batch_processing_iac_aws_spark.session import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def canon(df: pd.DataFrame):
    import datetime as dt

    import numpy as np

    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if isinstance(v, float):
            return None if math.isnan(v) else v
        if isinstance(v, dt.date) and not isinstance(v, dt.datetime):
            return dt.datetime(v.year, v.month, v.day)
        if isinstance(v, np.ndarray):
            return tuple(cell(x) for x in v.tolist())
        if isinstance(v, np.generic):
            return cell(v.item())
        if isinstance(v, pd.Timestamp):
            return v.to_pydatetime()
        if v is pd.NaT:
            return None
        return v

    recs = [tuple(cell(v) for v in r) for r in df.itertuples(index=False)]
    recs.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return recs


def main() -> int:
    spark = get_spark("cross_sf", cpus="16")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    bad = []
    for name, oracle in ORACLES.items():
        try:
            sdf = QUERIES[name](spark, SF).toPandas()
            odf = con.execute(oracle).df()
            ok = (
                len(sdf) == len(odf)
                and sorted(map(str.lower, sdf.columns))
                == sorted(map(str.lower, odf.columns))
                and canon(sdf) == canon(odf)
            )
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            bad.append((name, f"ERROR {type(e).__name__}: {str(e)[:150]}"))
            continue
        if not ok:
            bad.append((name, f"mismatch rows {len(sdf)}/{len(odf)}"))
    print(f"MARKER checked {len(ORACLES)} oracles at {SF}")
    for n, msg in bad:
        print("MARKER FAIL", n, msg)
    print("MARKER RESULT:", "ALL GREEN" if not bad else f"{len(bad)} failures")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
