"""Dataset-of-files: latest-partition selection (driver- and engine-side),
landing, explicit-schema CSV reads, idempotent partitioned writes."""

from __future__ import annotations

import pyspark.sql.functions as F

from batch_processing_iac_aws_spark.io import read_csv, write_parquet
from batch_processing_iac_aws_spark.sources.files import (
    land,
    latest_dated_file,
    latest_partition,
    parse_file_date,
    with_file_date,
)

CSV = "start_time,end_time,samples,temperature\n2023-07-03 00:00:00,2023-07-03 00:01:00,4,21.5\n"


def _write_dataset(tmp_path):
    d = tmp_path / "ds"
    d.mkdir()
    for name in (
        "20230603_measurement_data.csv",
        "20230703_measurement_data.csv",
        "notes.csv",
    ):
        (d / name).write_text(CSV)
    return d


def test_latest_dated_file_skips_nonconforming(tmp_path):
    d = _write_dataset(tmp_path)
    latest = latest_dated_file(str(d))
    assert latest is not None and latest.name == "20230703_measurement_data.csv"
    assert parse_file_date("notes.csv") is None


def test_latest_dated_file_empty_dir_returns_none(tmp_path):
    d = tmp_path / "empty"
    d.mkdir()
    assert latest_dated_file(str(d)) is None


def test_land_is_idempotent(tmp_path):
    src = tmp_path / "20230803_measurement_data.csv"
    src.write_text(CSV)
    ds = tmp_path / "ds2"
    p1 = land(src, ds)
    p2 = land(src, ds)
    assert p1 == p2 and p1.read_text() == CSV


def test_engine_side_latest_partition(spark, tmp_path):
    d = _write_dataset(tmp_path)
    df = read_csv(spark, f"{d}/*_measurement_data.csv", infer=True)
    dated = with_file_date(df)
    latest = latest_partition(dated, "file_date")
    dates = {str(r["file_date"]) for r in latest.collect()}
    assert dates == {"2023-07-03"}


def test_write_parquet_partition_overwrite_idempotent(spark, tmp_path):
    out = str(tmp_path / "w")
    df = spark.createDataFrame(
        [("2023-07-03", 1.0), ("2023-07-03", 2.0)], "ingest_date string, v double"
    )
    write_parquet(df, out, partition_by=["ingest_date"])
    write_parquet(df, out, partition_by=["ingest_date"])  # re-run: no dupes
    assert spark.read.parquet(out).count() == 2

    other = spark.createDataFrame([("2023-08-03", 3.0)], "ingest_date string, v double")
    write_parquet(other, out, partition_by=["ingest_date"])
    assert spark.read.parquet(out).count() == 3  # other partition untouched


def test_read_json_lines(spark, tmp_path):
    from batch_processing_iac_aws_spark.io import read_json

    p = tmp_path / "events.jsonl"
    p.write_text('{"id": 1, "v": 1.5}\n{"id": 2, "v": null}\n')
    df = read_json(spark, str(p), schema="id long, v double")
    rows = sorted((r["id"], r["v"]) for r in df.collect())
    assert rows == [(1, 1.5), (2, None)]


def test_orc_roundtrip_with_partition_overwrite(spark, tmp_path):
    from batch_processing_iac_aws_spark.io import read_orc, write_orc

    out = str(tmp_path / "orc")
    df = spark.createDataFrame(
        [("2023-07-03", 1.0), ("2023-07-03", 2.0)], "ingest_date string, v double"
    )
    write_orc(df, out, partition_by=["ingest_date"])
    write_orc(df, out, partition_by=["ingest_date"])  # idempotent re-run
    back = read_orc(spark, out)
    assert back.count() == 2
    assert sorted(r["v"] for r in back.collect()) == [1.0, 2.0]


def test_compact_parquet_bounds_files_and_preserves_rows(spark, tmp_path):
    from batch_processing_iac_aws_spark.io import compact_parquet

    path = str(tmp_path / "frag")
    # fragment: 20 files of 50 rows each
    df = spark.range(1000).withColumn("v", F.col("id") * 2.0)
    df.repartition(20).write.parquet(path)
    import glob

    assert len(glob.glob(f"{path}/*.parquet")) >= 20
    before = sorted(r["id"] for r in spark.read.parquet(path).collect())

    compact_parquet(spark, path, target_file_rows=1000)
    files_after = glob.glob(f"{path}/*.parquet")
    assert len(files_after) < 20
    after = sorted(r["id"] for r in spark.read.parquet(path).collect())
    assert after == before


def test_clustered_write_gives_disjoint_file_ranges(spark, tmp_path):
    """Range clustering must produce files whose min/max footer stats are
    DISJOINT on the cluster column — the property that lets readers skip
    whole files on a range predicate."""
    import glob

    import pyarrow.parquet as pq

    from batch_processing_iac_aws_spark.io import write_clustered_parquet

    path = str(tmp_path / "clustered")
    df = spark.range(10_000).withColumn("v", (F.col("id") * 7919) % 10_000)
    write_clustered_parquet(df, path, cluster_by=["v"], num_files=8)

    ranges = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        col_idx = [md.schema.column(i).name for i in range(md.num_columns)].index("v")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) >= 4
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges {hi1} > {lo2}"
    # nothing lost
    assert spark.read.parquet(path).count() == 10_000


def test_with_file_date_ignores_path_digit_runs(spark, tmp_path):
    """Review regression: digits in directory names must not shadow the
    filename's date stamp."""
    d = tmp_path / "run_123456789"
    d.mkdir()
    f = d / "20230703_measurement_data.csv"
    f.write_text("a,b\n1,2\n")
    df = spark.read.option("header", True).csv(str(f))
    import datetime

    row = with_file_date(df).collect()[0]
    assert row["file_date"] == datetime.date(2023, 7, 3)
