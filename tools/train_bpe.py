"""Train the committed BPE merges fixture (fixtures/bpe_merges.txt) from
the sf0.001 documents corpus — deterministic (frequency-then-lexicographic
tie-break), so re-running on the same corpus reproduces the file byte-for-
byte. Rerun only if the training corpus intentionally changes; the fixture
is DATA both engines read (Spark through the count_tokens seam, DuckDB as
a VALUES literal in the docs_token_budget_bpe oracle).

    python tools/train_bpe.py [n_merges]
"""

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from batch_processing_iac_aws_spark.operators.text import (  # noqa: E402
    train_bpe_merges,
)

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "bpe_merges.txt",
)


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    texts = [
        r[0]
        for r in duckdb.sql(
            "SELECT text FROM '/root/testdata/sf0.001/documents.parquet'"
            " WHERE text IS NOT NULL ORDER BY doc_id"
        ).fetchall()
    ]
    merges = train_bpe_merges(texts, n_merges=n_merges)
    with open(OUT, "w", encoding="utf-8") as f:
        for x, y in merges:
            f.write(f"{x}\t{y}\n")
    print(f"wrote {len(merges)} merges to {OUT}")


if __name__ == "__main__":
    main()
