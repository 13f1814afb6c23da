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
