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
- the fetched row keys come back as a semi-join against the key-sorted
  main table (the key filter pushes into its parquet scan; AQE
  broadcasts the index side at runtime when it is small — a hot value
  matching millions of rows degrades to a shuffled semi-join instead
  of OOMing a forced broadcast).  At 100 TB: index-range scan + point
  fetches, no full scan.

Consistency is explicit, not magical: the index records the main
table's manifest version AND incarnation id at build time; a lookup on
a stale index raises ``StaleIndexError`` (opt out with
``check_fresh=False``, which resolves against the SNAPSHOT the index
was built from — a genuine point-in-time lookup), and ``refresh_index``
rebuilds.  A main table that was REPLACEd under the index is detected
by the incarnation id and always raises, even with
``check_fresh=False`` — its version counter restarted, so the stamped
version now names a different table's history.  Synchronous index
maintenance on every write is deliberately NOT done — at scale an
index rebuild is a compact batch job, and a silently-async index that
pretends to be fresh is how phantom reads happen.

Nulls in the indexed column are not indexed (SQL-index convention);
indexed values whose string form contains ``\\x00`` are rejected at
build time rather than silently mis-ranged.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    ByteType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructType,
)

from cascading_hbase_spark.keyed.table import (
    DEFAULT_RETAIN,
    SinkMode,
    _gc_orphans,
    _load_meta,
    _save_meta,
    _write_history,
    _writer_lock,
    apply_changefeed,
    changefeed_keyed,
    read_keyed,
    write_keyed,
)

__all__ = [
    "StaleIndexError", "attach_index_stream_stamp", "create_index",
    "refresh_index", "drop_index", "index_lookup",
]

_SEP = "\x00"
_SUFFIX = "__kt_idx_"


class StaleIndexError(RuntimeError):
    """The main table has committed past (or was replaced under) the
    index's build snapshot."""


def _index_path(path: str, col: str) -> str:
    return path.rstrip("/") + _SUFFIX + col


def create_index(spark: SparkSession, path: str, col: str) -> None:
    """Build (or rebuild) the equality index for ``col``."""
    meta = _load_meta(path)
    key = meta["key"]
    # Pin the read to the version just captured: a concurrent main
    # commit between the meta load and the scan must not leave the
    # recorded stamp naming a version other than the data indexed.
    version = meta["version"]
    df = read_keyed(spark, path, generation=version).filter(
        F.col(col).isNotNull()
    )
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
    # The provenance stamp rides the index write's own atomic commit —
    # a separate post-write meta save would leave a stamp-less index
    # behind a crash between the two.
    write_keyed(
        idx, ipath, "idx_key", mode=SinkMode.REPLACE,
        meta_extra={
            "index_of": {
                "path": path, "col": col, "version": version,
                "table_id": meta.get("table_id"),
            }
        },
    )


def refresh_index(spark: SparkSession, path: str, col: str) -> None:
    """Bring the index current — INCREMENTALLY when the stamp proves
    it possible (r11): apply only the main table's changefeed since the
    stamped version, O(changed rows) instead of the full O(table)
    rebuild.  An update that does not touch the indexed column costs
    the index NOTHING — the null-safe value filter drops it before the
    merge — which is the difference between an index surviving a
    wide-table update storm at 100 TB and re-scanning the world.

    The delta: inserts/value-updates upsert ``<new value>\\x00<key>``,
    deletes/value-updates remove ``<old value>\\x00<key>`` (pre-images
    from ``changefeed_keyed(include_old=True)``); both sides land in
    ONE atomic ``apply_changefeed`` merge whose commit also carries
    the advanced stamp — a crash leaves the old (stamp, data) pair or
    the new one, never a half-refreshed index.  An index-silent
    interval still commits (the stamp must advance for
    ``index_lookup``'s freshness check).

    Falls back to a full rebuild (``create_index``) whenever increment
    cannot be proven: missing index, pre-incarnation-stamp index, a
    REPLACEd main table, or a stamp below the readable horizon
    (retain/vacuum) — the same rebuild-signal taxonomy as the
    replica/matview twins, resolved here by just doing the rebuild
    (an index rebuild is self-contained; theirs are not)."""
    ipath = _index_path(path, col)
    try:
        info = _load_meta(ipath).get("index_of", {})
    except FileNotFoundError:
        return create_index(spark, path, col)
    meta = _load_meta(path)
    version = meta["version"]
    stamp_v = info.get("version")
    horizon = max(
        version - meta.get("retain", DEFAULT_RETAIN) + 1,
        meta.get("vacuum_horizon", 1),
    )
    if (
        info.get("table_id") is None
        or info.get("table_id") != meta.get("table_id")
        or stamp_v is None
        or stamp_v < horizon
        or stamp_v > version
    ):
        return create_index(spark, path, col)
    if stamp_v == version:
        return  # already current — no commit
    feed = changefeed_keyed(
        spark, path, stamp_v, to_generation=version, include_old=True
    )
    batch = _index_delta(feed, meta["key"], col)
    apply_changefeed(
        spark, ipath, batch,
        meta_extra={
            "index_of": {
                "path": path, "col": col, "version": version,
                "table_id": meta.get("table_id"),
            }
        },
    )


def _index_delta(feed: DataFrame, key: str, col: str) -> DataFrame:
    """One changefeed interval (``include_old=True`` rows) as the index
    MERGE batch: upsert ``<new value>\\x00<key>``, retract ``<old
    value>\\x00<key>`` — shared by the scheduled ``refresh_index`` and
    the streaming maintainer (``streaming/ops.stream_index``).  Raises
    on NUL in a new value's string form (prefix-range safety)."""
    new_v = F.col(col)
    old_v = F.col("_before").getField(col)
    is_upsert = F.col("_change").isin("insert", "update")
    is_delete = F.col("_change") == "delete"
    is_retract = F.col("_change").isin("update", "delete")
    # value-unchanged UPDATES are index-silent (null-safe: the index
    # treats null as not-indexed on both sides already).  DELETES must
    # retract UNCONDITIONALLY: a delete row carries the pre-delete
    # payload in-row, so new_v == old_v on it and a value-moved gate
    # would silently keep the dead entry — a later re-insert of the
    # key under a different value would then make the stale composite
    # key a FALSE lookup match (the semi-join sees the key alive).
    value_moved = ~new_v.eqNullSafe(old_v)

    def _row(val_col, change: str) -> DataFrame:
        vs = val_col.cast("string")
        return (
            feed.filter(
                (is_upsert if change == "update" else is_retract)
                & val_col.isNotNull()
                & (value_moved | (is_delete if change == "delete" else F.lit(False)))
            ).select(
                F.concat(vs, F.lit(_SEP), F.col(key).cast("string"))
                .alias("idx_key"),
                val_col.alias("idx_value"),
                F.col(key).cast("string").alias("ref_key"),
                F.lit(change).alias("_change"),
            )
        )

    plus = _row(new_v, "update")
    if plus.filter(F.col("idx_value").cast("string").contains(_SEP)).limit(1).count():
        raise ValueError(
            f"column {col!r} contains the index separator NUL in its "
            f"string form; cannot maintain a prefix-ranged index"
        )
    return plus.unionByName(_row(old_v, "delete"))


def _index_meta_commit(ipath: str, mutate) -> None:
    """Meta-only commit on the INDEX table (the ``set_ttl`` pattern):
    ``mutate(info)`` edits the ``index_of`` entry in place, version
    bumps, history snapshots."""
    with _writer_lock(ipath):
        meta = _load_meta(ipath)
        info = meta.get("index_of")
        if info is None:
            raise ValueError(f"{ipath} is not an index table")
        info = dict(info)
        mutate(info)
        meta["index_of"] = info
        meta["version"] = meta.get("version", 1) + 1
        _save_meta(ipath, meta)
        _write_history(ipath, meta)
        _gc_orphans(ipath, meta)


def attach_index_stream_stamp(path: str, col: str, checkpoint: str) -> None:
    """Stamp ``stream: {checkpoint, batch_id: -1}`` into the index's
    ``index_of`` entry at STREAM ATTACH time — the index twin of
    ``matview.attach_stream_stamp`` / ``replica.attach_replica_stream_
    stamp``: scheduled ``refresh_index`` commits are refused from the
    moment the stream owns the index (the ``write_keyed`` stream-stamp
    clobber guard), and every stream start can cross-check the
    checkpoint's planned offsets against the APPLIED stamp.
    Idempotent for the same checkpoint; a different one raises."""

    def mutate(info: dict) -> None:
        st = info.get("stream")
        if st is not None:
            if st.get("checkpoint") != checkpoint:
                raise StaleIndexError(
                    f"index on {col!r} is stream-maintained under "
                    f"checkpoint {st.get('checkpoint')!r}; rebuild with "
                    f"create_index to move it to a new checkpoint"
                )
            raise _AlreadyAttached()
        info["stream"] = {"checkpoint": checkpoint, "batch_id": -1}

    try:
        _index_meta_commit(_index_path(path, col), mutate)
    except _AlreadyAttached:
        pass


class _AlreadyAttached(Exception):
    """Internal: the attach stamp is already present (no-op commit)."""


def drop_index(path: str, col: str) -> None:
    # through the control-plane seam: under a non-local plane a direct
    # rmtree would delete only the data dirs and leave the index's
    # manifest object alive — the index would still report exists()
    # while its generation dirs are gone (r09 review finding)
    from cascading_hbase_spark.keyed.controlplane import get_control_plane

    get_control_plane().delete_tree_quiet(_index_path(path, col))


def index_lookup(
    spark: SparkSession,
    path: str,
    col: str,
    value,
    check_fresh: bool = True,
) -> DataFrame:
    """Main-table rows where ``col == value``, resolved through the
    index: a bucket-pruned range scan of the value prefix, then a
    semi-join of the matching row keys into the main table.

    ``check_fresh=False`` is a point-in-time lookup: it resolves
    against the main-table SNAPSHOT the index was built from, so the
    result honors the documented contract even when later commits
    rewrote an indexed row to a different value.  It raises loudly if
    that snapshot has fallen out of the main table's retention."""
    ipath = _index_path(path, col)
    try:
        imeta = _load_meta(ipath)
    except FileNotFoundError:
        raise FileNotFoundError(
            f"no index on {col!r} for keyed table {path}; create_index first"
        ) from None
    info = imeta.get("index_of", {})
    main_meta = _load_meta(path)
    same_incarnation = info.get("table_id") == main_meta.get("table_id")
    fresh = same_incarnation and info.get("version") == main_meta["version"]
    if not same_incarnation:
        # REPLACE restarted the version counter: the stamp's version
        # names a DIFFERENT table's history, so neither a fresh nor a
        # point-in-time read is possible — always loud
        raise StaleIndexError(
            f"index on {col!r} was built against a previous incarnation "
            f"of {path} (the table was replaced); refresh_index()"
        )
    if check_fresh and not fresh:
        raise StaleIndexError(
            f"index on {col!r} was built at table version "
            f"{info.get('version')} but the table is at "
            f"{main_meta['version']}; refresh_index() or pass "
            f"check_fresh=False for a point-in-time lookup"
        )
    # The prefix must be the SAME string form the index keys were built
    # with: CAST(<column type> AS STRING).  Casting the probe value
    # through the COLUMN's type first is what makes that exact — a
    # Python literal's inferred type is not enough (Decimal('1.5')
    # infers decimal(2,1) -> '1.5' while a decimal(10,2) column stored
    # '1.50'; 1 infers bigint -> '1' while a double column stored
    # '1.0').  Where value and column types already align (str/bool/
    # integral — CAST is the identity/'true'/str() respectively) the
    # form is computed locally; other combinations pay one 1-row
    # driver-local evaluation through the column type.
    if value is None:
        raise ValueError(
            f"index on {col!r} does not cover NULL (nulls are not "
            f"indexed, SQL-index convention); filter the main table"
        )
    col_type = None
    schema_json = main_meta.get("schema")
    if schema_json:
        try:
            col_type = StructType.fromJson(json.loads(schema_json))[col].dataType
        except (KeyError, ValueError):
            col_type = None
    if isinstance(value, str) and isinstance(col_type, StringType):
        val_str = value
    elif isinstance(value, bool) and isinstance(col_type, BooleanType):
        val_str = "true" if value else "false"
    elif (
        isinstance(value, int)
        and not isinstance(value, bool)
        and isinstance(col_type, (ByteType, ShortType, IntegerType, LongType))
    ):
        val_str = str(value)
    else:
        probe = F.lit(value)
        if col_type is not None:
            probe = probe.cast(col_type)
        val_str = spark.range(1).select(probe.cast("string")).first()[0]
        if val_str is None:
            raise ValueError(
                f"lookup value {value!r} does not cast to indexed "
                f"column {col!r}'s type {col_type}"
            )
    prefix = val_str + _SEP
    # Every key for this value is exactly <val>\x00<rowkey>, so the
    # tight exclusive upper bound is <val>\x01 — correct for any
    # rowkey content (a ￿ sentinel would drop rowkeys starting
    # with a code point above U+FFFF).
    keys = (
        read_keyed(spark, ipath, start=prefix, stop=val_str + "\x01")
        .select("ref_key")
    )
    key = main_meta["key"]
    # ALWAYS pin to the stamped version — when fresh it equals the
    # version the freshness check just approved, and pinning closes
    # the race where a commit lands between that check and the read
    # (the v5 index's keys semi-joined into a v6 table would return
    # rows whose indexed value no longer matches the lookup).
    main = read_keyed(spark, path, generation=info.get("version"))
    # Under AQE (the default), no forced broadcast hint: the key set
    # broadcasts at runtime when small (the common selective lookup)
    # and a hot value matching millions of rows degrades to a shuffled
    # semi-join instead of OOMing.  With AQE disabled there is no
    # runtime re-plan, and an unhinted semi-join would shuffle the
    # ENTIRE main table for one lookup — keep the broadcast hint then.
    aqe = str(
        spark.conf.get("spark.sql.adaptive.enabled", "true")
    ).lower() == "true"
    return main.join(
        keys if aqe else F.broadcast(keys),
        main[key].cast("string") == keys["ref_key"],
        "left_semi",
    )
