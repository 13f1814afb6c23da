"""Misuse paths must fail fast with actionable errors — a platform
library's error surface is part of its API."""

from __future__ import annotations

import pytest

from cascading_hbase_spark.keyed.replica import create_replica, sync_replica
from cascading_hbase_spark.keyed.table import (
    SinkMode,
    merge_keyed,
    write_keyed,
)


def _df(spark, rows=((1, "a"),)):
    return spark.createDataFrame(list(rows), "k long, v string")


def test_write_keyed_rejects_missing_key_column(spark, tmp_path):
    with pytest.raises(ValueError, match="key column"):
        write_keyed(_df(spark), str(tmp_path / "t"), "nope")


def test_merge_keyed_rejects_missing_change_column(spark, tmp_path):
    path = str(tmp_path / "t")
    write_keyed(_df(spark), path, "k")
    with pytest.raises(ValueError, match="change column"):
        merge_keyed(spark, path, _df(spark))


def test_merge_keyed_on_missing_table_fails_cleanly(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        merge_keyed(
            spark, str(tmp_path / "absent"),
            spark.createDataFrame([(1, "a", "insert")], "k long, v string, _change string"),
        )


def test_sync_replica_rejects_non_replica(spark, tmp_path):
    primary, other = str(tmp_path / "p"), str(tmp_path / "o")
    write_keyed(_df(spark), primary, "k")
    write_keyed(_df(spark), other, "k")  # a plain table, not a replica
    with pytest.raises(ValueError, match="not a replica"):
        sync_replica(spark, primary, other)


def test_replace_then_keep_contract(spark, tmp_path):
    path = str(tmp_path / "t")
    write_keyed(_df(spark), path, "k", mode=SinkMode.REPLACE)
    with pytest.raises(FileExistsError):
        write_keyed(_df(spark), path, "k", mode=SinkMode.KEEP)
