"""Keyed tables: the reference's [R] surface as Parquet-backed,
range-bucketed, last-write-wins tables.

Semantics (SURVEY.md §1.1, §2.1):

- upsert-by-key / last-write-wins: 13 tuples with 5 distinct keys store
  5 rows (MultiFamilyHBaseTest.java:57,71); later batches win, with an
  explicit intra-batch order (``seq_col``) standing in for the HBase
  cell timestamp (HBaseScheme.java:127).
- sink modes KEEP / APPEND / REPLACE per HBaseTap.java:32-40 with the
  REPLACE drop-and-recreate branch at :123-128.
- range scans with [start, stop) pruning per
  TableInputFormatWrap.java:55-65; field projection with the key
  prepended per HBaseScheme.java:157-162.
- deletes per TableOutputFormatWrap.java:82, as an anti-join rewrite.

Physical layout — designed so the 100 TB append is incremental AND
transactional:

    <path>/_kt_meta.json                    the manifest: key name, bucket
                                            boundaries, next seq, families,
                                            schema, bucket -> generation map
    <path>/_kt_bucket=<i>/_kt_gen=<n>/*.parquet   one generation dir per
                                            committed rewrite of a bucket

Bucket boundaries are fixed at table creation (sampled key quantiles),
so every write lands each key in the same bucket forever.  An APPEND
merges *only the buckets its batch touches*: the merge materializes in
a staging sibling, moves into fresh generation directories, and COMMITS
by atomically replacing the manifest — readers resolve data only
through the manifest's generation pointers, so a multi-bucket append is
all-or-nothing (a crash anywhere pre-commit leaves the previous
snapshot intact plus invisible orphans, GC'd by the next write).
Untouched buckets' files are never read or rewritten (the analogue of
HBase routing a Put to one region, not compacting the whole table).
The seq counter persists before the data write, so a crashed-and-
replayed batch never reuses a committed seq.  Range scans prune to
the overlapping buckets (partition pruning) and push the key predicate
into the parquet scan (row-group min/max skipping, since each bucket is
written sorted by key).
"""

from __future__ import annotations

import enum
import json
import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

__all__ = ["SinkMode", "KeyedTable", "write_keyed", "read_keyed", "delete_keyed"]

SEQ_COL = "_kt_seq"
BUCKET_COL = "_kt_bucket"
GEN_COL = "_kt_gen"
GEN_PREFIX = GEN_COL + "="
META_FILE = "_kt_meta.json"


class SinkMode(enum.Enum):
    """HBaseTap sink modes (HBaseTap.java:32-40): KEEP fails on an
    existing table, APPEND (the default) upserts into it, REPLACE drops
    and recreates it."""

    KEEP = "keep"
    APPEND = "append"
    REPLACE = "replace"


# ---------------------------------------------------------------------------
# Metadata
# ---------------------------------------------------------------------------

def _meta_path(path: str) -> str:
    return os.path.join(path, META_FILE)


def _exists(path: str) -> bool:
    return os.path.isfile(_meta_path(path))


def _load_meta(path: str) -> dict:
    with open(_meta_path(path)) as f:
        return json.load(f)


def _save_meta(path: str, meta: dict) -> None:
    os.makedirs(path, exist_ok=True)
    tmp = _meta_path(path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, _meta_path(path))


def _sample_boundaries(df: DataFrame, key: str, n_buckets: int) -> list:
    """Fixed range boundaries from a bounded sample of the batch's keys.

    Sample FIRST, then distinct only the sample — the table-creation
    path must never run a full ``distinct().count()`` shuffle of every
    key (at 100 TB that is a full-table shuffle just to size a sample).
    ``sample(frac)`` is a map-side filter, ``distinct()`` shuffles only
    the sampled subset, and ``limit`` over the hash-partitioned distinct
    output is an approximately uniform draw of distinct keys (any subset
    of hash partitions is unbiased in the key).  Escalating fractions
    cover tiny batches without a ``count()``."""
    if n_buckets <= 1:
        return []
    keys_df = df.select(key).where(F.col(key).isNotNull())
    sample: list = []
    for frac in (0.001, 0.05, None):
        sampled = keys_df if frac is None else keys_df.sample(False, frac, seed=42)
        sample = sorted({r[0] for r in sampled.distinct().limit(20000).collect()})
        if len(sample) >= n_buckets * 4:
            break
    if not sample:
        return []
    bounds = []
    for i in range(1, n_buckets):
        b = sample[min(len(sample) - 1, (len(sample) * i) // n_buckets)]
        if not bounds or b > bounds[-1]:
            bounds.append(b)
    return bounds


def _bucket_expr(key: str, boundaries: list) -> F.Column:
    """bucket(k) = number of boundaries <= k — bucket 0 is (-inf, b0),
    the last bucket [b_last, +inf); every key maps to exactly one."""
    b = F.lit(0)
    for bound in boundaries:
        b = b + F.when(F.col(key) >= F.lit(bound), 1).otherwise(0)
    return b.cast("int")


def _bucket_of(value, boundaries: list) -> int:
    n = 0
    for bound in boundaries:
        if value >= bound:
            n += 1
    return n


# ---------------------------------------------------------------------------
# Write path
# ---------------------------------------------------------------------------

def _lww(df: DataFrame, key: str, order_cols: list) -> DataFrame:
    """Collapse to one row per key: the highest (order_cols) wins."""
    w = Window.partitionBy(key).orderBy(*[c.desc() for c in order_cols])
    return df.withColumn("_kt_rn", F.row_number().over(w)).filter(
        F.col("_kt_rn") == 1
    ).drop("_kt_rn")


def _order_cols(df_cols: list[str], key: str, seq_col: str | None) -> list:
    intra = [F.col(seq_col)] if seq_col else [
        F.col(c) for c in df_cols if c != key and c != SEQ_COL
    ]
    return [F.col(SEQ_COL), *intra]


def _write_partitioned(df: DataFrame, path: str, key: str) -> None:
    """Write bucket-partitioned, each bucket's files sorted by key (so
    the key predicate prunes row groups on read)."""
    spark = df.sparkSession
    n = spark.sparkContext.defaultParallelism
    out = df.repartitionByRange(n, F.col(key)).sortWithinPartitions(key)
    out.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(path)


def _stage_dir(path: str) -> str:
    """Staging sibling OUTSIDE the table directory, so a crashed merge
    can never pollute partition discovery on the live table."""
    return path.rstrip("/") + "__kt_stage"


def _gc_orphans(path: str, gens: dict) -> None:
    """Remove generation directories the manifest no longer references
    (crashed pre-commit writes, superseded generations).

    Retention: the immediately-previous generation survives one commit,
    so a reader DataFrame planned against the prior snapshot keeps
    working across a single concurrent write (Delta-style grace
    window); anything older — or newer than the live pointer (crashed
    uncommitted attempts) — is collected."""
    for d in os.listdir(path):
        if not d.startswith(BUCKET_COL + "="):
            continue
        b = d.split("=", 1)[1]
        live = gens.get(b)
        full = os.path.join(path, d)
        if live is None:
            shutil.rmtree(full, ignore_errors=True)
            continue
        for g in os.listdir(full):
            if not g.startswith(GEN_PREFIX):
                continue
            n = int(g[len(GEN_PREFIX):])
            if n not in (live, live - 1):
                shutil.rmtree(os.path.join(full, g), ignore_errors=True)


def _publish(stage: str, path: str, meta: dict, affected: list) -> None:
    """Transactional commit: move each staged bucket into a NEW
    generation directory (``_kt_bucket=<b>/_kt_gen=<n>``), then flip
    the manifest (``_kt_meta.json``) in one atomic ``os.replace``.

    Readers resolve data through the manifest's generation pointers, so
    the flip makes ALL affected buckets visible at once — a crash at
    any earlier point leaves only unreferenced orphan directories (the
    previous snapshot stays fully readable), which the next write
    garbage-collects.  This is the engine's stand-in for the atomicity
    the reference got from HBase for free (HBaseTap.java:44-101
    delegates lifecycle to the region server)."""
    gens = meta.setdefault("gens", {})
    for b in affected:
        sb = str(b)
        src = os.path.join(stage, f"{BUCKET_COL}={b}")
        if os.path.isdir(src):
            newgen = gens.get(sb, -1) + 1
            dst = os.path.join(path, f"{BUCKET_COL}={b}", f"{GEN_PREFIX}{newgen}")
            if os.path.isdir(dst):  # orphan of a crashed attempt
                shutil.rmtree(dst)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.replace(src, dst)
            gens[sb] = newgen
        else:
            # the batch emptied this bucket: drop its pointer
            gens.pop(sb, None)
    _save_meta(path, meta)  # <- the commit point
    _gc_orphans(path, gens)


def _migrate_legacy(path: str, meta: dict) -> None:
    """Upgrade a flat-bucket-dir table (pre-generation layout) in place:
    every bucket's files move into its generation-0 directory and the
    manifest gains the generation map.  Idempotent; a no-op for
    current-layout tables."""
    if "gens" in meta:
        return
    gens: dict[str, int] = {}
    for d in os.listdir(path):
        if not d.startswith(BUCKET_COL + "="):
            continue
        b = d.split("=", 1)[1]
        full = os.path.join(path, d)
        g0 = os.path.join(full, GEN_PREFIX + "0")
        os.makedirs(g0, exist_ok=True)
        for f in os.listdir(full):
            if not f.startswith(GEN_PREFIX):
                os.replace(os.path.join(full, f), os.path.join(g0, f))
        gens[b] = 0
    meta["gens"] = gens
    _save_meta(path, meta)


def _stage_and_publish(
    df: DataFrame, path: str, key: str, meta: dict, affected: list | None = None
) -> None:
    """Materialize ``df`` bucket-partitioned in the staging sibling,
    then commit via ``_publish``.  ``affected=None`` publishes every
    bucket the write produced (table creation)."""
    stage = _stage_dir(path)
    shutil.rmtree(stage, ignore_errors=True)
    try:
        _write_partitioned(df, stage, key)
        if affected is None:
            affected = sorted(
                int(d.split("=", 1)[1])
                for d in os.listdir(stage)
                if d.startswith(BUCKET_COL + "=")
            )
        _publish(stage, path, meta, affected)
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def write_keyed(
    df: DataFrame,
    path: str,
    key: str,
    mode: SinkMode = SinkMode.APPEND,
    seq_col: str | None = None,
    n_buckets: int | None = None,
    families: dict[str, str] | None = None,
) -> None:
    """Write ``df`` as a keyed table at ``path``.

    ``seq_col`` is the explicit intra-batch write order (the stand-in
    for the HBase cell timestamp); without it, ties collapse
    deterministically by the row's full column tuple.  APPEND into an
    existing table reads and rewrites only the buckets the batch
    touches, staged to a sibling directory and swapped per-bucket.

    ``families`` maps column -> column-family name, mirroring the
    reference's multi-family field map (HBaseScheme.java:55,61-82);
    unmapped columns land in the default family ``"cf"``, the analogue
    of families auto-derived from the scheme (HBaseScheme.java:170-177).
    Families are fixed at table creation, like HBase's.
    """
    if key not in df.columns:
        raise ValueError(f"key column {key!r} not in {df.columns}")
    spark = df.sparkSession
    exists = _exists(path)
    if mode is SinkMode.KEEP and exists:
        # SinkMode.KEEP: never clobber an existing sink (Tap semantics).
        raise FileExistsError(f"keyed table already exists (SinkMode.KEEP): {path}")
    if mode is SinkMode.REPLACE and exists:
        # REPLACE drops and recreates (HBaseTap.java:124-128).
        shutil.rmtree(path)
        exists = False

    if not exists:
        n_buckets = n_buckets or spark.sparkContext.defaultParallelism
        boundaries = _sample_boundaries(df, key, n_buckets)
        fam = families or {}
        family_map = {
            c: fam.get(c, "cf") for c in df.columns if c not in (key, SEQ_COL)
        }
        batch = _lww(
            df.withColumn(SEQ_COL, F.lit(0)), key, _order_cols(df.columns, key, seq_col)
        ).withColumn(BUCKET_COL, _bucket_expr(key, boundaries))
        meta = {
            "key": key,
            "boundaries": boundaries,
            "next_seq": 1,
            "families": family_map,
            "schema": df.schema.json(),
            "gens": {},
        }
        _stage_and_publish(batch, path, key, meta)
        return

    meta = _load_meta(path)
    _migrate_legacy(path, meta)
    # legacy manifests predate the stored schema; backfill from the batch
    meta.setdefault("schema", df.schema.json())
    boundaries = meta["boundaries"]
    seq = meta["next_seq"]
    # Persist the seq bump BEFORE the data write: if the merge crashes
    # and the batch replays, it gets a fresh seq — LWW order stays write
    # order instead of degrading to arbitrary column-tuple ties.
    meta["next_seq"] = seq + 1
    _save_meta(path, meta)
    batch = df.withColumn(SEQ_COL, F.lit(seq)).withColumn(
        BUCKET_COL, _bucket_expr(key, boundaries)
    )
    # Only the buckets this batch touches participate in the merge;
    # every other bucket's generation pointer (and files) is untouched.
    affected = sorted(
        r[0] for r in batch.select(BUCKET_COL).distinct().collect()
    )
    current = _read_raw(spark, path, meta).filter(F.col(BUCKET_COL).isin(affected))
    merged = _lww(
        current.unionByName(batch), key, _order_cols(df.columns, key, seq_col)
    )
    _stage_and_publish(merged, path, key, meta, affected)


# ---------------------------------------------------------------------------
# Read path
# ---------------------------------------------------------------------------

def _read_raw(
    spark: SparkSession,
    path: str,
    meta: dict,
    min_bucket: int | None = None,
    max_bucket: int | None = None,
):
    """Scan through the manifest's generation pointers (exactly the
    committed snapshot; orphans are invisible).  Bucket-range pruning
    happens HERE, driver-side, before any file listing — the analogue
    of the reference pruning regions before creating splits
    (TableInputFormatWrap.java:55-65).  Includes SEQ/BUCKET columns."""
    gens = meta.get("gens")
    if gens is None:  # legacy layout (flat bucket dirs)
        return spark.read.parquet(path)
    keep = {
        int(b): g
        for b, g in gens.items()
        if (min_bucket is None or int(b) >= min_bucket)
        and (max_bucket is None or int(b) <= max_bucket)
    }
    if not keep:
        schema_json = meta.get("schema")
        if schema_json is None and gens:
            # legacy-migrated manifest without a stored schema: recover
            # it from any live generation (zero rows read)
            b, g = next(iter(sorted(gens.items())))
            any_path = os.path.join(path, f"{BUCKET_COL}={b}", f"{GEN_PREFIX}{g}")
            return (
                spark.read.option("basePath", path)
                .parquet(any_path)
                .drop(GEN_COL)
                .filter(F.lit(False))
            )
        if schema_json is None:
            raise FileNotFoundError(
                f"keyed table {path} is empty and its manifest stores no schema"
            )
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(json.loads(schema_json))
        empty = spark.createDataFrame([], schema)
        return empty.withColumn(SEQ_COL, F.lit(0)).withColumn(
            BUCKET_COL, F.lit(0)
        )
    paths = [
        os.path.join(path, f"{BUCKET_COL}={b}", f"{GEN_PREFIX}{g}")
        for b, g in sorted(keep.items())
    ]
    return spark.read.option("basePath", path).parquet(*paths).drop(GEN_COL)


def read_keyed(
    spark: SparkSession,
    path: str,
    start=None,
    stop=None,
    fields: list[str] | None = None,
    family: str | None = None,
) -> DataFrame:
    """Scan a keyed table, optionally range-pruned to [start, stop) and
    projected to ``fields`` with the key prepended
    (HBaseScheme.java:157-162 'prepend').  ``family`` projects to one
    column family's columns (key prepended) — the per-scheme family
    selection of MultiFamilyHBaseTest.java:58-62.

    A key range prunes twice: bucket directories via the partition
    column (split pruning, TableInputFormatWrap.java:55-65) and row
    groups via the pushed key predicate on sorted files."""
    meta = _load_meta(path)
    key, boundaries = meta["key"], meta["boundaries"]
    min_b = _bucket_of(start, boundaries) if start is not None else None
    max_b = _bucket_of(stop, boundaries) if stop is not None else None
    df = _read_raw(spark, path, meta, min_b, max_b)
    if start is not None:
        df = df.filter(
            (F.col(BUCKET_COL) >= _bucket_of(start, boundaries))
            & (F.col(key) >= start)
        )
    if stop is not None:
        df = df.filter(
            (F.col(BUCKET_COL) <= _bucket_of(stop, boundaries))
            & (F.col(key) < stop)
        )
    df = df.drop(SEQ_COL, BUCKET_COL)
    if family is not None:
        if fields is not None:
            raise ValueError("pass either fields= or family=, not both")
        fam_map = meta.get("families", {})
        if family not in set(fam_map.values()):
            raise KeyError(
                f"unknown column family {family!r}; table has "
                f"{sorted(set(fam_map.values()))}"
            )
        fields = [c for c in df.columns if fam_map.get(c) == family]
    if fields is not None:
        df = df.select(key, *[f for f in fields if f != key])
    return df


def delete_keyed(spark: SparkSession, path: str, keys: DataFrame) -> None:
    """Delete rows whose key appears in ``keys`` (single-column DF) —
    the Delete dispatch of TableOutputFormatWrap.java:79-84 as an
    anti-join rewrite of only the affected buckets."""
    meta = _load_meta(path)
    _migrate_legacy(path, meta)
    key, boundaries = meta["key"], meta["boundaries"]
    keys = keys.toDF(key).select(key)
    affected = sorted(
        r[0]
        for r in keys.select(_bucket_expr(key, boundaries).alias("b"))
        .distinct()
        .collect()
    )
    current = _read_raw(spark, path, meta).filter(F.col(BUCKET_COL).isin(affected))
    remaining = current.join(keys, key, "left_anti")
    # Staged rewrite of only the affected buckets; a bucket emptied by
    # the delete is simply absent from the stage and loses its
    # generation pointer at commit.
    _stage_and_publish(remaining, path, key, meta, affected)


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
              seq_col: str | None = None,
              families: dict[str, str] | None = None) -> None:
        write_keyed(df, self.path, self.key, mode, seq_col, families=families)

    def read(self, spark: SparkSession, start=None, stop=None,
             fields: list[str] | None = None,
             family: str | None = None) -> DataFrame:
        return read_keyed(spark, self.path, start, stop, fields, family)

    def families(self) -> dict[str, str]:
        """column -> family map fixed at creation (HBaseScheme.java:61-82)."""
        return _load_meta(self.path).get("families", {})

    def delete(self, spark: SparkSession, keys: DataFrame) -> None:
        delete_keyed(spark, self.path, keys)

    def uri(self) -> str:
        """Identity for cascade dependency resolution — the analogue of
        'hbase://tableName' (HBaseTap.java:142-148)."""
        return f"keyed://{os.path.abspath(self.path)}"
