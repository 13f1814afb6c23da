"""Secondary (equality) index over a keyed table — the engine-side
analogue of the index tables HBase users maintain next to a row-keyed
table (the reference's tables are reachable by row key only,
HBaseTap.java:52-60; anything else is a full scan, so the ecosystem
convention is a second table keyed by the indexed value).

The index IS a keyed table: its key is the composite string
``<value>\\x00<row key>``, so

- an equality lookup is a *range scan* on the value prefix — bucket-dir
  pruned and row-group pruned like any keyed range scan, touching
  O(matching rows) of the index, never the main table's width;
- the fetched row keys come back as a tiny broadcast semi-join against
  the key-sorted main table (the key filter pushes into its parquet
  scan).  At 100 TB: index-range scan + point fetches, no full scan.

Consistency is explicit, not magical: the index snapshot records the
main table's manifest version at build time; a lookup on a stale index
raises ``StaleIndexError`` (opt out with ``check_fresh=False``), and
``refresh_index`` rebuilds.  Synchronous index maintenance on every
write is deliberately NOT done — at scale an index rebuild is a compact
batch job, and a silently-async index that pretends to be fresh is how
phantom reads happen.

Nulls in the indexed column are not indexed (SQL-index convention);
indexed values whose string form contains ``\\x00`` are rejected at
build time rather than silently mis-ranged.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cascading_hbase_spark.keyed.table import (
    SinkMode,
    _load_meta,
    _save_meta,
    read_keyed,
    write_keyed,
)

__all__ = [
    "StaleIndexError", "create_index", "refresh_index", "drop_index",
    "index_lookup",
]

_SEP = "\x00"
_SUFFIX = "__kt_idx_"


class StaleIndexError(RuntimeError):
    """The main table has committed past the index's build snapshot."""


def _index_path(path: str, col: str) -> str:
    return path.rstrip("/") + _SUFFIX + col


def create_index(spark: SparkSession, path: str, col: str) -> None:
    """Build (or rebuild) the equality index for ``col``."""
    meta = _load_meta(path)
    key = meta["key"]
    df = read_keyed(spark, path).filter(F.col(col).isNotNull())
    val_s = F.col(col).cast("string")
    bad = df.filter(val_s.contains(_SEP)).limit(1).count()
    if bad:
        raise ValueError(
            f"column {col!r} contains the index separator NUL in its "
            f"string form; cannot build a prefix-ranged index"
        )
    idx = df.select(
        F.concat(val_s, F.lit(_SEP), F.col(key).cast("string")).alias("idx_key"),
        F.col(col).alias("idx_value"),
        F.col(key).cast("string").alias("ref_key"),
    )
    ipath = _index_path(path, col)
    write_keyed(idx, ipath, "idx_key", mode=SinkMode.REPLACE)
    imeta = _load_meta(ipath)
    imeta["index_of"] = {"path": path, "col": col, "version": meta["version"]}
    _save_meta(ipath, imeta)


refresh_index = create_index


def drop_index(path: str, col: str) -> None:
    import shutil

    shutil.rmtree(_index_path(path, col), ignore_errors=True)


def index_lookup(
    spark: SparkSession,
    path: str,
    col: str,
    value,
    check_fresh: bool = True,
) -> DataFrame:
    """Main-table rows where ``col == value``, resolved through the
    index: a bucket-pruned range scan of the value prefix, then a
    broadcast semi-join of the matching row keys into the main table."""
    ipath = _index_path(path, col)
    try:
        imeta = _load_meta(ipath)
    except FileNotFoundError:
        raise FileNotFoundError(
            f"no index on {col!r} for keyed table {path}; create_index first"
        ) from None
    info = imeta.get("index_of", {})
    main_meta = _load_meta(path)
    if check_fresh and info.get("version") != main_meta["version"]:
        raise StaleIndexError(
            f"index on {col!r} was built at table version "
            f"{info.get('version')} but the table is at "
            f"{main_meta['version']}; refresh_index() or pass "
            f"check_fresh=False for a point-in-time lookup"
        )
    prefix = str(value) + _SEP
    keys = (
        read_keyed(spark, ipath, start=prefix, stop=prefix + "\uffff")
        .select("ref_key")
    )
    key = main_meta["key"]
    main = read_keyed(spark, path)
    return main.join(
        F.broadcast(keys),
        main[key].cast("string") == keys["ref_key"],
        "left_semi",
    )
