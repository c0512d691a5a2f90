"""End-to-end reference-pipeline parity: discover latest CSV -> expand ->
idempotent partitioned write, plus the pipeline runner semantics."""

from __future__ import annotations

import pytest

from batch_processing_iac_aws_spark.reference_job import (
    run_pipeline,
    run_reference_job,
)

CSV_OLD = (
    "start_time,end_time,samples,temperature\n"
    "2023-06-03 00:00:00,2023-06-03 00:01:00,2,20.0\n"
)
CSV_NEW = (
    "start_time,end_time,samples,temperature\n"
    "2023-07-03 00:00:00,2023-07-03 00:01:00,4,21.5\n"
    "2023-07-03 00:01:00,2023-07-03 00:02:40,3,21.7\n"
)


@pytest.fixture()
def dataset(tmp_path):
    d = tmp_path / "src"
    d.mkdir()
    (d / "20230603_measurement_data.csv").write_text(CSV_OLD)
    (d / "20230703_measurement_data.csv").write_text(CSV_NEW)
    return d


def test_job_processes_only_latest_file(spark, dataset, tmp_path):
    out = str(tmp_path / "out")
    run_reference_job(spark, str(dataset), out)
    got = spark.read.parquet(out)
    # 4 + 3 samples from the July file only; June file ignored
    assert got.count() == 7
    # partition-column values are type-inferred on read (DATE here)
    assert {
        str(r["ingest_date"]) for r in got.select("ingest_date").collect()
    } == {"2023-07-03"}


def test_job_rerun_is_idempotent(spark, dataset, tmp_path):
    out = str(tmp_path / "out")
    run_reference_job(spark, str(dataset), out)
    run_reference_job(spark, str(dataset), out)  # re-run: same partition
    assert spark.read.parquet(out).count() == 7


def test_job_fails_hard_on_empty_source(spark, tmp_path):
    empty = tmp_path / "none"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        run_reference_job(spark, str(empty), str(tmp_path / "o"))


def test_compat_mode_emits_reference_strings(spark, dataset, tmp_path):
    out = str(tmp_path / "out_compat")
    run_reference_job(spark, str(dataset), out, compat=True)
    written = spark.read.parquet(out)
    row = written.first()
    assert isinstance(row["start_time"], str)  # from_unixtime string output
    # column-set parity: the reference drops samples / timedelta_per_sample /
    # the posexplode index before writing (pyspark_script.py:118-124)
    assert "samples" not in written.columns
    assert "sample_idx" not in written.columns
    assert "timedelta_per_sample" not in written.columns


def test_run_pipeline_sequences_and_stops_on_failure():
    calls = []

    def ok():
        calls.append("ok")
        return 1

    def boom():
        calls.append("boom")
        raise RuntimeError("x")

    res = run_pipeline([("a", ok), ("b", ok)])
    assert res == {"a": 1, "b": 1}

    calls.clear()
    with pytest.raises(RuntimeError):
        run_pipeline([("a", ok), ("b", boom), ("c", ok)])
    assert calls == ["ok", "boom"]  # c never ran


def test_run_pipeline_retries():
    attempts = []

    def flaky():
        attempts.append(1)
        if len(attempts) < 3:
            raise RuntimeError("transient")
        return "done"

    res = run_pipeline([("j", flaky)], max_retries=3)
    assert res == {"j": "done"} and len(attempts) == 3
