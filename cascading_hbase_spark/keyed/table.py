"""Keyed-table storage layer: the engine's equivalent of the reference's
HBase table binding.

Semantics reproduced (with reference citations for parity checking):

- upsert / last-write-wins by row key: writing 13 tuples with 5 distinct
  keys stores 5 rows (MultiFamilyHBaseTest.java:57,71);
- sink modes KEEP / APPEND (default) / REPLACE
  (HBaseTap.java:32-40; REPLACE drop-and-recreate branch
  HBaseTap.java:123-128);
- APPEND accumulates distinct keys across writes: 13 -> 26 rows on a
  second run with fresh keys (MultiFamilyCascadeHBaseTest.java:89-104);
- range scans with [start, stop) key bounds prune storage
  (HBaseScheme.java:54,61,77; TableInputFormatWrap.java:55-65);
- field-map projection with the key prepended
  (HBaseScheme.java:151-162);
- delete support (TableOutputFormatWrap.java:82) as an anti-join
  rewrite;
- always-stale freshness for cascade scheduling
  (HBaseTap.java:65-67,103-105).

Physical design for scale: tables are parquet directories written
``repartitionByRange(key).sortWithinPartitions(key)`` so key-range
predicates prune files via parquet min/max stats — the same effect as
HBase's region pruning, without custom split code.  A write-epoch
column ``_kt_seq`` (plus intra-batch ``seq_col``) makes last-write-wins
deterministic where HBase used wall-clock cell timestamps
(HBaseScheme.java:127).  The APPEND merge is a union + one hash
aggregate per write — at 100 TB this would be swapped for an
incremental MERGE (Delta/Iceberg) keeping the same API.
"""

from __future__ import annotations

import enum
import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

__all__ = ["SinkMode", "KeyedTable", "write_keyed", "read_keyed", "delete_keyed"]

SEQ_COL = "_kt_seq"


class SinkMode(enum.Enum):
    """HBaseTap sink modes (HBaseTap.java:32-40): KEEP fails on an
    existing table, APPEND (the default) upserts into it, REPLACE drops
    and recreates it."""

    KEEP = "keep"
    APPEND = "append"
    REPLACE = "replace"


def _exists(path: str) -> bool:
    return os.path.isdir(path) and any(
        f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(path)
    )


def _lww(df: DataFrame, key: str, order_cols: list) -> DataFrame:
    """Collapse to one row per key: the highest (order_cols) wins."""
    w = Window.partitionBy(key).orderBy(*[c.desc() for c in order_cols])
    return df.withColumn("_kt_rn", F.row_number().over(w)).filter(
        F.col("_kt_rn") == 1
    ).drop("_kt_rn")


def write_keyed(
    df: DataFrame,
    path: str,
    key: str,
    mode: SinkMode = SinkMode.APPEND,
    seq_col: str | None = None,
    n_buckets: int | None = None,
) -> None:
    """Write ``df`` as a keyed table at ``path``.

    ``seq_col`` is the explicit intra-batch write order (the stand-in
    for the HBase cell timestamp); without it, ties collapse
    deterministically by the row's full column tuple.
    """
    spark = df.sparkSession
    if key not in df.columns:
        raise ValueError(f"key column {key!r} not in {df.columns}")
    exists = _exists(path)
    if mode is SinkMode.KEEP and exists:
        # SinkMode.KEEP: never clobber an existing sink (Tap semantics).
        raise FileExistsError(f"keyed table already exists (SinkMode.KEEP): {path}")
    if mode is SinkMode.REPLACE and exists:
        # REPLACE drops and recreates (HBaseTap.java:124-128).
        shutil.rmtree(path)
        exists = False

    batch_seq = 0
    merged = df
    if exists:
        current = spark.read.parquet(path)
        batch_seq = current.agg(F.max(SEQ_COL)).collect()[0][0] + 1
        merged = current.unionByName(df.withColumn(SEQ_COL, F.lit(batch_seq)))
    else:
        merged = df.withColumn(SEQ_COL, F.lit(batch_seq))

    intra = [F.col(seq_col)] if seq_col else [
        F.col(c) for c in df.columns if c != key
    ]
    collapsed = _lww(merged, key, [F.col(SEQ_COL), *intra])

    n = n_buckets or spark.sparkContext.defaultParallelism
    out = collapsed.repartitionByRange(n, F.col(key)).sortWithinPartitions(key)
    out.write.mode("overwrite").parquet(path + ".tmp")
    if os.path.isdir(path):
        shutil.rmtree(path)
    os.rename(path + ".tmp", path)


def read_keyed(
    spark: SparkSession,
    path: str,
    start=None,
    stop=None,
    fields: list[str] | None = None,
) -> DataFrame:
    """Scan a keyed table, optionally range-pruned to [start, stop) and
    projected to ``fields`` with the key prepended
    (HBaseScheme.java:157-162 'prepend')."""
    df = spark.read.parquet(path).drop(SEQ_COL)
    key = df.columns[0]
    if start is not None:
        df = df.filter(F.col(key) >= start)
    if stop is not None:
        df = df.filter(F.col(key) < stop)
    if fields is not None:
        df = df.select(key, *[f for f in fields if f != key])
    return df


def delete_keyed(spark: SparkSession, path: str, keys: DataFrame) -> None:
    """Delete rows whose key appears in ``keys`` (single-column DF) —
    the Delete dispatch of TableOutputFormatWrap.java:79-84 as an
    anti-join rewrite."""
    df = spark.read.parquet(path)
    key = [c for c in df.columns if c != SEQ_COL][0]
    remaining = df.join(
        keys.toDF(key).select(key), key, "left_anti"
    )
    n = spark.sparkContext.defaultParallelism
    out = remaining.repartitionByRange(n, F.col(key)).sortWithinPartitions(key)
    out.write.mode("overwrite").parquet(path + ".tmp")
    shutil.rmtree(path)
    os.rename(path + ".tmp", path)


class KeyedTable:
    """Object handle mirroring HBaseTap (table-by-name binding,
    HBaseTap.java:27,32-40 + lifecycle :44-101)."""

    def __init__(self, path: str, key: str = "key"):
        self.path = path
        self.key = key

    # --- lifecycle (HBaseTap.java:69-101) ---
    def exists(self) -> bool:
        return _exists(self.path)

    def drop(self) -> None:
        if os.path.isdir(self.path):
            shutil.rmtree(self.path)

    def modified_time(self) -> float:
        """Always 'now': a keyed sink is never up-to-date, forcing
        cascades to re-run flows into it (HBaseTap.java:65-67,103-105)."""
        import time

        return time.time()

    # --- IO ---
    def write(self, df: DataFrame, mode: SinkMode = SinkMode.APPEND,
              seq_col: str | None = None) -> None:
        write_keyed(df, self.path, self.key, mode, seq_col)

    def read(self, spark: SparkSession, start=None, stop=None,
             fields: list[str] | None = None) -> DataFrame:
        return read_keyed(spark, self.path, start, stop, fields)

    def delete(self, spark: SparkSession, keys: DataFrame) -> None:
        delete_keyed(spark, self.path, keys)

    def uri(self) -> str:
        """Identity for cascade dependency resolution — the analogue of
        'hbase://tableName' (HBaseTap.java:142-148)."""
        return f"keyed://{os.path.abspath(self.path)}"
