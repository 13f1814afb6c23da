"""write_sized_parquet: output files land near the target size and the
sizing decision is returned for observability."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from cascading_hbase_spark.operators.sizing import (
    estimate_bytes_per_row, write_sized_parquet,
)


def _file_sizes(path):
    return [
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ]


def test_write_sized_parquet_hits_target_band(spark, tmp_path):
    df = spark.range(200_000).select(
        "id", F.md5(F.col("id").cast("string")).alias("payload")
    )
    out = str(tmp_path / "sized")
    info = write_sized_parquet(df, out, target_mb=1.0)
    sizes = _file_sizes(out)
    assert info["n_rows"] == 200_000
    assert info["n_files"] == len(sizes) >= 2
    target = 1.0 * 1024 * 1024
    # every non-tail file within [0.3x, 3x] of target: order-of-size is
    # the contract (compression locality shifts exact bytes)
    for s in sorted(sizes)[1:] if len(sizes) > 1 else sizes:
        assert target * 0.3 <= s <= target * 3.0, sizes
    got = spark.read.parquet(out)
    assert got.count() == 200_000


def test_estimate_rejects_empty(spark):
    df = spark.range(0).select("id")
    with pytest.raises(ValueError):
        estimate_bytes_per_row(df)


def test_sizing_decision_reports_written_reality(spark, tmp_path):
    """The returned n_rows/n_files come from what was WRITTEN (footer
    count + engine file listing), so for a non-deterministic input the
    observability record still matches the data on disk (r06: replaced
    an eager full-input checkpoint, which is a non-starter for a
    100 TB-class sink)."""
    # rand() makes the plan non-deterministic across evaluations; the
    # written parquet is the only truth
    df = spark.range(50_000).select(
        "id", F.rand(seed=None).alias("r")
    ).filter(F.col("r") > 0.5)
    out = str(tmp_path / "nondet")
    info = write_sized_parquet(df, out, target_mb=64.0)
    got = spark.read.parquet(out)
    assert info["n_rows"] == got.count()
    assert info["n_files"] == len(_file_sizes(out))


def test_sizing_append_mode_reports_batch_not_directory(spark, tmp_path):
    """Under mode='append' the record covers THIS batch (pre/post
    inputFiles() diff), with the directory-wide total in dir_n_files —
    cumulative n_rows misstated every append after the first
    (ADVICE r06)."""
    out = str(tmp_path / "appended")
    df1 = spark.range(1000).select("id")
    info1 = write_sized_parquet(df1, out, target_mb=64.0, mode="append")
    assert info1["n_rows"] == 1000

    df2 = spark.range(250).select("id")
    info2 = write_sized_parquet(df2, out, target_mb=64.0, mode="append")
    assert info2["n_rows"] == 250  # the batch, not 1250
    assert info2["n_files"] >= 1
    assert info2["dir_n_files"] == info1["n_files"] + info2["n_files"]
    assert spark.read.parquet(out).count() == 1250  # directory truth intact


def test_sizing_append_pre_listing_error_propagates(spark, tmp_path):
    """Only genuinely-missing-path analysis errors mean 'fresh path';
    an unreadable EXISTING populated directory (corrupt footer) must
    propagate instead of silently classifying every pre-existing file
    as this batch's output (ADVICE r08)."""
    out = tmp_path / "corrupt"
    out.mkdir()
    (out / "part-00000.parquet").write_bytes(b"not a parquet footer")
    df = spark.range(100).select("id")
    with pytest.raises(Exception) as exc_info:
        write_sized_parquet(df, str(out), target_mb=64.0, mode="append")
    # and the failure happened at the pre-listing (nothing was written)
    assert _file_sizes(str(out)) == [os.path.getsize(out / "part-00000.parquet")]
    assert "PATH_NOT_FOUND" not in str(exc_info.value)
