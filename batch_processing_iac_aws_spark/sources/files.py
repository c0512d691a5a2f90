"""Dataset-of-files utilities.

The reference treats an S3 prefix as a dataset and encodes the partition in
the filename (``YYYYMMDD_measurement_data.csv``), discovering files with a
driver-side boto3 paginator (pyspark_skript/pyspark_script.py:20-36) and
picking the latest via regex + strptime argmax (:38-52; upload_csv_to_s3.py
:26-35 does the same client-side). Rebuilt here filesystem-agnostic:

* :func:`list_dataset_files` / :func:`latest_dated_file` honor the same
  filename convention over any local/posix path (the driver-side part);
* :func:`latest_partition` does the selection ENGINE-side with
  ``input_file_name()`` + ``regexp_extract`` + a max subquery — no driver
  listing, scales to millions of files, and Catalyst prunes non-latest files
  when the layout is Hive-partitioned;
* :func:`land` is the ingestion step (upload_csv_to_s3.py:20-45) minus AWS:
  copy the newest source file into the dataset directory, idempotently.
"""

from __future__ import annotations

import re
import os
import shutil
from datetime import datetime
from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_DATE_RE = re.compile(r"(\d{8})")


def list_dataset_files(dataset_dir: str, suffix: str = ".csv") -> list[Path]:
    return sorted(p for p in Path(dataset_dir).glob(f"*{suffix}") if p.is_file())


def parse_file_date(name: str) -> datetime | None:
    """Extract the YYYYMMDD stamp from a filename; None if absent/invalid."""
    m = _DATE_RE.search(name)
    if not m:
        return None
    try:
        return datetime.strptime(m.group(1), "%Y%m%d")
    except ValueError:
        return None


def latest_dated_file(dataset_dir: str, suffix: str = ".csv") -> Path | None:
    """Newest file by filename date stamp; files without a valid stamp are
    skipped (reference behavior, pyspark_script.py:47-52) — but an empty
    result is returned as None for the caller to fail hard on, instead of
    the reference's print-and-continue."""
    dated = [
        (d, p)
        for p in list_dataset_files(dataset_dir, suffix)
        if (d := parse_file_date(p.name)) is not None
    ]
    return max(dated)[1] if dated else None


def latest_partition(df: DataFrame, date_col: str = "ingest_date") -> DataFrame:
    """Engine-side latest-partition selection: keep only rows of the max
    partition value. On a Hive-partitioned layout the equality prunes to a
    single partition directory at plan time."""
    latest = df.agg(F.max(date_col).alias(date_col))
    return df.join(F.broadcast(latest), date_col)


def with_file_date(df: DataFrame, out_col: str = "file_date") -> DataFrame:
    """Attach the filename-encoded date (the reference's convention honored
    as-is) via input_file_name + regexp_extract — no driver listing.
    The date stamp is extracted from the BASENAME only: input_file_name
    returns the full URI, and an 8-digit run in a bucket/job/directory
    name (s3://x/run_123456789/20230703_data.csv) would otherwise win
    over the filename's stamp and parse to NULL."""
    basename = F.element_at(F.split(F.input_file_name(), "/"), -1)
    return df.withColumn(
        out_col,
        F.to_date(F.regexp_extract(basename, r"(\d{8})", 1), "yyyyMMdd"),
    )


def land(source_file: str | Path, dataset_dir: str | Path) -> Path:
    """Idempotently copy a file into the dataset directory (ingestion step).
    Existing same-named file is replaced — re-landing converges."""
    src = Path(source_file)
    dst_dir = Path(dataset_dir)
    dst_dir.mkdir(parents=True, exist_ok=True)
    dst = dst_dir / src.name
    # copy under a dot-prefixed temp name, then rename atomically: Spark
    # readers ignore dotfiles, so a concurrent scan of the dataset dir
    # never observes a half-written file (a direct copy2 to the final
    # name is readable mid-copy — truncated rows, no error)
    tmp = dst_dir / f".{src.name}.landing"
    shutil.copy2(src, tmp)
    os.replace(tmp, dst)
    return dst
