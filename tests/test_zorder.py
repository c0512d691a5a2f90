"""Quantified data-skipping for io.write_zorder_parquet: after Z-ordering
lineitem on (l_partkey, l_suppkey), a narrow range probe on EITHER column
must overlap only a minority of files' footer [min, max] ranges — whereas a
single-column range-clustered layout skips only on its leading column. This
is the property that makes the layout pay at 100 TB: pruning happens from
footer stats alone, before any data page is read."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

from batch_processing_iac_aws_spark.catalog import load_table
from batch_processing_iac_aws_spark.io import (
    write_clustered_parquet,
    write_zorder_parquet,
)

SF = "/root/testdata/sf0.01"


def _file_ranges(path: str, col: str) -> list[tuple[float, float]]:
    out = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        out.append((min(mins), max(maxs)))
    return out


def _overlap_fraction(ranges, lo, hi) -> float:
    hit = sum(1 for mn, mx in ranges if not (mx < lo or mn > hi))
    return hit / len(ranges)


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("layout")
    l = load_table(spark, SF, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    zpath, cpath = str(base / "zorder"), str(base / "clustered")
    write_zorder_parquet(
        l, zpath, zorder_by=["l_partkey", "l_suppkey"], num_files=16
    )
    write_clustered_parquet(l, cpath, cluster_by=["l_partkey"], num_files=16)
    bounds = {}
    for col in ("l_partkey", "l_suppkey"):
        mn, mx = (
            l.selectExpr(f"min({col})", f"max({col})").first()[0],
            l.selectExpr(f"min({col})", f"max({col})").first()[1],
        )
        span = mx - mn
        # deterministic 5%-wide probe in the middle of the key space
        bounds[col] = (mn + 0.40 * span, mn + 0.45 * span)
    return zpath, cpath, bounds


def test_zorder_skips_on_both_columns(layouts):
    """The writer's block-aligned deterministic layout (io.py) makes every
    file one Morton tile (a quarter x quarter rectangle for 16 files over
    2 columns), so a sub-quarter probe on either column overlaps exactly
    4/16 files — and the same files on every rerun. The earlier
    sample-based range partitioning floated around 0.44-0.63."""
    zpath, _, bounds = layouts
    for col, (lo, hi) in bounds.items():
        frac = _overlap_fraction(_file_ranges(zpath, col), lo, hi)
        assert frac <= 0.3, f"z-order failed to skip on {col}: {frac:.2f}"


def test_single_column_clustering_skips_only_its_leading_column(layouts):
    zpath, cpath, bounds = layouts
    lo, hi = bounds["l_partkey"]
    assert _overlap_fraction(_file_ranges(cpath, "l_partkey"), lo, hi) <= 0.3
    # the non-leading column gets no locality from range clustering...
    lo, hi = bounds["l_suppkey"]
    cfrac = _overlap_fraction(_file_ranges(cpath, "l_suppkey"), lo, hi)
    assert cfrac >= 0.9
    # ...while z-order is strictly better there
    zfrac = _overlap_fraction(_file_ranges(zpath, "l_suppkey"), lo, hi)
    assert zfrac < cfrac


def test_zorder_roundtrip_preserves_rows(spark, layouts):
    zpath, _, _ = layouts
    orig = load_table(spark, SF, "lineitem")
    back = spark.read.parquet(zpath)
    assert back.count() == orig.count()
    got = back.selectExpr(
        "sum(l_partkey)", "sum(l_suppkey)", "count(distinct l_partkey)"
    ).first()
    want = orig.selectExpr(
        "sum(l_partkey)", "sum(l_suppkey)", "count(distinct l_partkey)"
    ).first()
    assert got == want


def test_zorder_layout_is_deterministic(spark, layouts, tmp_path):
    """Rewriting the same data must land the SAME files: identical
    per-file [min, max] footer ranges on every z-ordered column. The
    writer computes exact block-aligned quantile cuts and routes each
    cut range to a fixed output partition (hash-slot remap) — no
    sampling anywhere, so retries and recomputations reproduce the
    layout bit-for-bit."""
    zpath, _, _ = layouts
    l = load_table(spark, SF, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    again = str(tmp_path / "zorder_again")
    write_zorder_parquet(
        l, again, zorder_by=["l_partkey", "l_suppkey"], num_files=16
    )
    for col in ("l_partkey", "l_suppkey"):
        assert sorted(_file_ranges(zpath, col)) == sorted(
            _file_ranges(again, col)
        )


def test_zorder_empty_input_writes_empty_dataset(spark, tmp_path):
    """Empty input + num_files under the deterministic-histogram gate used
    to IndexError on hist[-1]; it must write a readable empty dataset with
    the schema intact, matching the repartitionByRange path's behavior."""
    df = (
        spark.range(0)
        .selectExpr("id AS l_partkey", "id AS l_suppkey", "id AS other")
    )
    out = str(tmp_path / "empty_z")
    write_zorder_parquet(
        df, out, zorder_by=["l_partkey", "l_suppkey"], bits=8, num_files=4
    )
    back = spark.read.parquet(out)
    assert back.count() == 0
    assert set(back.columns) == {"l_partkey", "l_suppkey", "other"}


def test_zorder_budget_overflow_raises(spark, tmp_path):
    import pytest

    from batch_processing_iac_aws_spark.io import write_zorder_parquet

    df = spark.createDataFrame([(1, 2, 3)], "a long, b long, c long")
    with pytest.raises(ValueError, match="deterministic"):
        write_zorder_parquet(
            df, str(tmp_path / "z"), zorder_by=["a", "b", "c"],
            bits=8, num_files=4,
        )
