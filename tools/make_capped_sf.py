"""Build a CAPPED variant of an SF directory for the upward cross-SF
sweep: real sf0.1 rows, but documents/embeddings subsampled to the first
``cap`` ids so the ~11 exhaustive-oracle dedup twins (all-pairs Jaccard /
recursive closure / BPE merge loop — DuckDB cost quadratic in corpus
size) stay oracle-feasible above the driver's sf0.01 gate. The registered
queries run UNCHANGED against the capped dir (both engines read the same
parquet), so this is an above-sf0.01 proof of the exact shipped code —
no query-side caps, no bench distortion. Every other table hardlinks (or
copies) through verbatim.

    python tools/make_capped_sf.py [src_sf_dir] [out_dir] [cap]
    python tools/probe_subset.py <out_dir> dedup_minhash ...

Default: /root/testdata/sf0.1 -> /tmp/spark_graft_sf0.1_cap1000, cap 1000
(2x the sf0.01 corpus; 1000^2 candidate pairs keep the worst oracle —
dedup_fuzzy_pipeline's exhaustive graph + recursive-CTE closure — in the
minutes, not the hours it needs at 5000 docs).
"""

import os
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CAP = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
OUT = (
    sys.argv[2]
    if len(sys.argv) > 2
    else f"/tmp/spark_graft_{os.path.basename(SRC.rstrip('/'))}_cap{CAP}"
)

CAPPED = {"documents": "doc_id", "embeddings": "vec_id"}


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for name in sorted(os.listdir(SRC)):
        if not name.endswith(".parquet"):
            continue
        src, dst = f"{SRC}/{name}", f"{OUT}/{name}"
        if os.path.exists(dst):
            os.remove(dst)
        table = name[: -len(".parquet")]
        key = CAPPED.get(table)
        if key is None:
            try:
                os.link(src, dst)  # hardlink: zero-copy, read-only use
            except OSError:
                shutil.copyfile(src, dst)
            print(f"# {name}: linked verbatim")
            continue
        con.execute(
            f"COPY (SELECT * FROM '{src}' WHERE {key} < {CAP} "
            f"ORDER BY {key}) TO '{dst}' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"# {name}: capped to {key} < {CAP} ({n} rows)")
    print(OUT)


if __name__ == "__main__":
    main()
