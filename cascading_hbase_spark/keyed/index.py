"""Secondary (equality) index over a keyed table — the engine-side
analogue of the index tables HBase users maintain next to a row-keyed
table (the reference's tables are reachable by row key only,
HBaseTap.java:52-60; anything else is a full scan, so the ecosystem
convention is a second table keyed by the indexed value).

The index IS a keyed table: its key is the composite string
``<encoded value>\\x00<row key>``, where the value encoding is
ORDER-PRESERVING for string / boolean / integral / date / timestamp
columns (integrals are offset by 2^63 and zero-padded to 20 digits —
the decimal-string analogue of HBase's OrderedBytes, which solves the
same problem for byte-sorted rowkeys: plain ``str(n)`` sorts "10"
before "2").  So

- an equality lookup is a *range scan* on the value prefix — bucket-dir
  pruned and row-group pruned like any keyed range scan, touching
  O(matching rows) of the index, never the main table's width;
- a RANGE lookup (``index_range_lookup``) is the same scan with value
  bounds instead of a single prefix — ``BETWEEN`` resolved through the
  index at O(matching rows), the classic secondary-range-scan HBase
  users hand-build with OrderedBytes rowkeys.  Float/decimal columns
  keep their plain CAST-string encoding (equality-only; their string
  form is not ordered) and refuse range lookups with a pointer to the
  main table's zone maps;
- a COVERING index (``create_index(..., include=[...])``) stores the
  named extra columns in-row, and a lookup whose ``fields`` are all
  covered is served INDEX-ONLY — zero main-table bytes touched, the
  difference between a point lookup costing O(matching rows) and
  O(matching rows + a wide-table fetch) at 100 TB;
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
    "refresh_index", "drop_index", "index_lookup", "index_range_lookup",
]

_SEP = "\x00"
_SUFFIX = "__kt_idx_"
# Key-encoding version, stamped into index_of at build time.  Bumped
# when the composite-key layout changes; a lookup through an index
# whose stamp does not match refuses (the stored keys would mis-range),
# and refresh_index resolves the mismatch by full rebuild.  v2 =
# order-preserving integral encoding (offset + zero-pad).
_ENC = 2
_I64_OFFSET = 2**63

_INTEGRAL = (ByteType, ShortType, IntegerType, LongType)


def _orderable(dtype) -> bool:
    """Types whose v2 encoding preserves the COLUMN order in the index
    key order — the precondition for ``index_range_lookup``.  String is
    identity; boolean is 'false' < 'true'; integrals are offset+padded;
    date/timestamp CAST AS STRING is ISO-formatted, which compares
    lexicographically as it compares temporally (Spark prints no
    trailing fraction zeros, and fraction digits without trailing
    zeros compare lexicographically as numerically)."""
    from pyspark.sql.types import DateType, TimestampType

    return isinstance(
        dtype, (StringType, BooleanType, DateType, TimestampType) + _INTEGRAL
    )


def _encode_expr(col_expr, dtype):
    """The indexed value as its composite-key string form (v2).
    Integrals map through ``lpad(v + 2^63, 20, '0')`` — decimal(20,0)
    arithmetic, exact over the full int64 range (2^64-1 < 10^20) and
    JVM-side end to end; everything else keeps CAST AS STRING."""
    if isinstance(dtype, _INTEGRAL):
        shifted = (
            col_expr.cast("decimal(20,0)")
            + F.lit(str(_I64_OFFSET)).cast("decimal(20,0)")
        ).cast("decimal(20,0)")
        return F.lpad(shifted.cast("string"), 20, "0")
    return col_expr.cast("string")


def _encode_value(spark: SparkSession, value, dtype) -> str:
    """The probe value encoded exactly as ``_encode_expr`` encoded the
    column — local fast paths where the two provably agree (str/bool/
    int/date), one 1-row driver-side evaluation of the SAME expression
    otherwise (timestamp fraction formatting and decimal scale padding
    are not worth re-implementing in Python)."""
    import datetime

    if isinstance(value, str) and isinstance(dtype, StringType):
        return value
    if isinstance(value, bool) and isinstance(dtype, BooleanType):
        return "true" if value else "false"
    if (
        isinstance(value, int)
        and not isinstance(value, bool)
        and isinstance(dtype, _INTEGRAL)
    ):
        if not -_I64_OFFSET <= value < _I64_OFFSET:
            raise ValueError(
                f"lookup value {value!r} is outside the int64 range of "
                f"indexed column type {dtype}"
            )
        return format(value + _I64_OFFSET, "020d")
    from pyspark.sql.types import DateType

    if (
        isinstance(value, datetime.date)
        and not isinstance(value, datetime.datetime)
        and isinstance(dtype, DateType)
    ):
        return value.isoformat()
    probe = F.lit(value)
    if dtype is not None:
        probe = probe.cast(dtype)
    enc = spark.range(1).select(_encode_expr(probe, dtype)).first()[0]
    if enc is None:
        raise ValueError(
            f"lookup value {value!r} does not cast to indexed column "
            f"type {dtype}"
        )
    return enc


class StaleIndexError(RuntimeError):
    """The main table has committed past (or was replaced under) the
    index's build snapshot."""


def _index_path(path: str, col: str) -> str:
    return path.rstrip("/") + _SUFFIX + col


def create_index(
    spark: SparkSession,
    path: str,
    col: str,
    include: list[str] | None = None,
    n_buckets: int | None = None,
) -> None:
    """Build (or rebuild) the index for ``col``.  ``include`` names
    extra columns stored in-row (a COVERING index): lookups whose
    ``fields`` are all covered never touch the main table.
    ``n_buckets`` sizes the index's own bucket count (default:
    cluster parallelism) — the index is usually much narrower than its
    main table, so size it to the index's bytes, not the table's."""
    meta = _load_meta(path)
    key = meta["key"]
    # Pin the read to the version just captured: a concurrent main
    # commit between the meta load and the scan must not leave the
    # recorded stamp naming a version other than the data indexed.
    version = meta["version"]
    df = read_keyed(spark, path, generation=version).filter(
        F.col(col).isNotNull()
    )
    include = list(include or [])
    missing = [c for c in include if c not in df.columns]
    if missing:
        raise ValueError(f"include columns not in table: {missing}")
    if col in include or key in include:
        raise ValueError(
            f"include must not repeat the indexed column {col!r} or the "
            f"key {key!r} — both are always covered"
        )
    dtype = df.schema[col].dataType
    if isinstance(dtype, StringType):
        # Only the identity (string) encoding can carry the separator;
        # encoded integrals are digits, date/timestamp are ISO.
        bad = df.filter(F.col(col).contains(_SEP)).limit(1).count()
        if bad:
            raise ValueError(
                f"column {col!r} contains the index separator NUL; "
                f"cannot build a prefix-ranged index"
            )
    idx = df.select(
        F.concat(
            _encode_expr(F.col(col), dtype), F.lit(_SEP),
            F.col(key).cast("string"),
        ).alias("idx_key"),
        F.col(col).alias("idx_value"),
        F.col(key).cast("string").alias("ref_key"),
        *[F.col(c) for c in include],
    )
    ipath = _index_path(path, col)
    # The provenance stamp rides the index write's own atomic commit —
    # a separate post-write meta save would leave a stamp-less index
    # behind a crash between the two.
    write_keyed(
        idx, ipath, "idx_key", mode=SinkMode.REPLACE, n_buckets=n_buckets,
        meta_extra={
            "index_of": {
                "path": path, "col": col, "version": version,
                "table_id": meta.get("table_id"),
                "enc": _ENC, "include": include,
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
    REPLACEd main table, a stamp below the readable horizon
    (retain/vacuum), or a pre-v2 key encoding — the same rebuild-signal
    taxonomy as the replica/matview twins, resolved here by just doing
    the rebuild (an index rebuild is self-contained; theirs are not).
    A covering index rebuilds with its stamped ``include`` list."""
    ipath = _index_path(path, col)
    try:
        info = _load_meta(ipath).get("index_of", {})
    except FileNotFoundError:
        return create_index(spark, path, col)
    include = info.get("include") or []
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
        or info.get("enc") != _ENC
        or stamp_v is None
        or stamp_v < horizon
        or stamp_v > version
    ):
        return create_index(spark, path, col, include=include)
    if stamp_v == version:
        return  # already current — no commit
    feed = changefeed_keyed(
        spark, path, stamp_v, to_generation=version, include_old=True
    )
    batch = _index_delta(feed, meta["key"], col, include=include)
    apply_changefeed(
        spark, ipath, batch,
        meta_extra={
            "index_of": {
                "path": path, "col": col, "version": version,
                "table_id": meta.get("table_id"),
                "enc": _ENC, "include": include,
            }
        },
    )


def _index_delta(
    feed: DataFrame, key: str, col: str, include: list[str] | None = None
) -> DataFrame:
    """One changefeed interval (``include_old=True`` rows) as the index
    MERGE batch: upsert ``<encoded new value>\\x00<key>``, retract
    ``<encoded old value>\\x00<key>`` — shared by the scheduled
    ``refresh_index`` and the streaming maintainer
    (``streaming/ops.stream_index``).  Raises on NUL in a new STRING
    value (prefix-range safety; non-string encodings cannot emit NUL).

    Covering (``include``): upserts carry the post-image include
    columns; an update that moves ONLY an include column (indexed
    value unchanged) upserts the SAME composite key with the fresh
    payload — no retraction needed — so the covering payload never
    goes stale while staying index-silent on the retract side."""
    include = list(include or [])
    dtype = feed.schema[col].dataType
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
    payload_moved = value_moved
    for c in include:
        payload_moved = payload_moved | ~F.col(c).eqNullSafe(
            F.col("_before").getField(c)
        )

    def _row(val_col, change: str) -> DataFrame:
        if change == "update":
            gate = is_upsert & payload_moved
            extras = [F.col(c) for c in include]
        else:
            gate = is_retract & (value_moved | is_delete)
            extras = [
                F.col("_before").getField(c).alias(c) for c in include
            ]
        return (
            feed.filter(gate & val_col.isNotNull()).select(
                F.concat(
                    _encode_expr(val_col, dtype), F.lit(_SEP),
                    F.col(key).cast("string"),
                ).alias("idx_key"),
                val_col.alias("idx_value"),
                F.col(key).cast("string").alias("ref_key"),
                *extras,
                F.lit(change).alias("_change"),
            )
        )

    plus = _row(new_v, "update")
    if isinstance(dtype, StringType) and (
        plus.filter(F.col("idx_value").contains(_SEP)).limit(1).count()
    ):
        raise ValueError(
            f"column {col!r} contains the index separator NUL; cannot "
            f"maintain a prefix-ranged index"
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


def _resolve(path: str, col: str, check_fresh: bool) -> tuple:
    """Shared lookup gates: missing index, foreign incarnation, stale
    key encoding, freshness.  Returns ``(ipath, info, main_meta)``."""
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
    if not same_incarnation:
        # REPLACE restarted the version counter: the stamp's version
        # names a DIFFERENT table's history, so neither a fresh nor a
        # point-in-time read is possible — always loud
        raise StaleIndexError(
            f"index on {col!r} was built against a previous incarnation "
            f"of {path} (the table was replaced); refresh_index()"
        )
    if info.get("enc") != _ENC:
        # stored composite keys use an older encoding: the probe's
        # encoded form would mis-range against them — never silently
        raise StaleIndexError(
            f"index on {col!r} was built with key-encoding "
            f"v{info.get('enc', 1)} but this engine ranges with "
            f"v{_ENC}; refresh_index() (resolves by rebuild)"
        )
    if check_fresh and info.get("version") != main_meta["version"]:
        raise StaleIndexError(
            f"index on {col!r} was built at table version "
            f"{info.get('version')} but the table is at "
            f"{main_meta['version']}; refresh_index() or pass "
            f"check_fresh=False for a point-in-time lookup"
        )
    return ipath, info, main_meta


def _col_type(main_meta: dict, col: str):
    schema_json = main_meta.get("schema")
    if schema_json:
        try:
            return StructType.fromJson(json.loads(schema_json))[col].dataType
        except (KeyError, ValueError):
            return None
    return None


def _serve(
    spark: SparkSession,
    path: str,
    col: str,
    info: dict,
    main_meta: dict,
    hits: DataFrame,
    fields: list[str] | None,
) -> DataFrame:
    """Resolve scanned index rows (``hits``) into the result: an
    INDEX-ONLY projection when every requested field is covered by the
    index row (key, indexed value, include columns) — zero main-table
    bytes — else a semi-join of the row keys into the main table
    pinned at the stamped version."""
    key = main_meta["key"]
    if fields is not None and not main_meta.get("ttl"):
        # Index-only reads are refused under a row-TTL policy: expiry
        # is enforced as a read-time filter on the MAIN table
        # (table._ttl_filter), which an index-only projection would
        # bypass — a covering lookup on a TTL table would serve
        # expired rows.  The semi-join path below stays correct (the
        # main-table read applies the filter), just not index-only.
        covered = {key, col, *(info.get("include") or [])}
        if set(fields) <= covered:
            key_t = _col_type(main_meta, key)
            mapping = {
                key: F.col("ref_key").cast(key_t).alias(key)
                if key_t is not None else F.col("ref_key").alias(key),
                col: F.col("idx_value").alias(col),
            }
            return hits.select(
                *[mapping.get(f, F.col(f)) for f in fields]
            )
    keys = hits.select("ref_key")
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
    out = main.join(
        keys if aqe else F.broadcast(keys),
        main[key].cast("string") == keys["ref_key"],
        "left_semi",
    )
    return out.select(*fields) if fields is not None else out


def index_lookup(
    spark: SparkSession,
    path: str,
    col: str,
    value,
    check_fresh: bool = True,
    fields: list[str] | None = None,
) -> DataFrame:
    """Main-table rows where ``col == value``, resolved through the
    index: a bucket-pruned range scan of the value prefix, then a
    semi-join of the matching row keys into the main table — or, when
    ``fields`` are all covered (the key, the indexed column, and the
    index's ``include`` list), an INDEX-ONLY projection that never
    touches the main table.

    ``check_fresh=False`` is a point-in-time lookup: it resolves
    against the main-table SNAPSHOT the index was built from, so the
    result honors the documented contract even when later commits
    rewrote an indexed row to a different value.  It raises loudly if
    that snapshot has fallen out of the main table's retention."""
    ipath, info, main_meta = _resolve(path, col, check_fresh)
    # The prefix must be the SAME encoded form the index keys were
    # built with (``_encode_expr`` through the COLUMN's type).  A
    # Python literal's inferred type is not enough (Decimal('1.5')
    # infers decimal(2,1) -> '1.5' while a decimal(10,2) column stored
    # '1.50'; 1 infers bigint while a double column stored '1.0').
    if value is None:
        raise ValueError(
            f"index on {col!r} does not cover NULL (nulls are not "
            f"indexed, SQL-index convention); filter the main table"
        )
    val_str = _encode_value(spark, value, _col_type(main_meta, col))
    prefix = val_str + _SEP
    # Every key for this value is exactly <val>\x00<rowkey>, so the
    # tight exclusive upper bound is <val>\x01 — correct for any
    # rowkey content (a ￿ sentinel would drop rowkeys starting
    # with a code point above U+FFFF).
    hits = read_keyed(spark, ipath, start=prefix, stop=val_str + "\x01")
    return _serve(spark, path, col, info, main_meta, hits, fields)


def index_range_lookup(
    spark: SparkSession,
    path: str,
    col: str,
    lower=None,
    upper=None,
    include_lower: bool = True,
    include_upper: bool = True,
    check_fresh: bool = True,
    fields: list[str] | None = None,
) -> DataFrame:
    """Main-table rows where ``col`` is in the given range, resolved
    through the index as ONE composite-key range scan — bucket-dir and
    row-group pruned to O(matching rows), the secondary range scan
    HBase users hand-build with OrderedBytes-encoded rowkeys.  Either
    bound may be None (open).  Requires an order-preserving value
    encoding (string / boolean / integral / date / timestamp); float
    and decimal columns refuse — their CAST-string form is not ordered
    — with the main table's zone maps as the scale path instead
    (``read_keyed(zone_filter=...)``).

    Bound-to-key mapping (keys are ``<enc(v)>\\x00<rowkey>``; the scan
    is ``[start, stop)``): inclusive lower -> ``enc(lower)\\x00``
    (first possible key of that value), exclusive lower ->
    ``enc(lower)\\x01`` (just past every key of that value); inclusive
    upper -> ``enc(upper)\\x01``, exclusive upper -> ``enc(upper)\\x00``.

    ``fields`` covered by the index (key / indexed column / include
    list) serve INDEX-ONLY, like ``index_lookup``."""
    ipath, info, main_meta = _resolve(path, col, check_fresh)
    dtype = _col_type(main_meta, col)
    if dtype is None or not _orderable(dtype):
        raise ValueError(
            f"index_range_lookup needs an order-preserving key encoding "
            f"and column {col!r} is {dtype} (string/boolean/integral/"
            f"date/timestamp only); use the main table's zone maps "
            f"(read_keyed(zone_filter=...)) for numeric ranges"
        )
    start = stop = None
    if lower is not None:
        enc_lo = _encode_value(spark, lower, dtype)
        start = enc_lo + (_SEP if include_lower else "\x01")
    if upper is not None:
        enc_hi = _encode_value(spark, upper, dtype)
        stop = enc_hi + ("\x01" if include_upper else _SEP)
    hits = read_keyed(spark, ipath, start=start, stop=stop)
    return _serve(spark, path, col, info, main_meta, hits, fields)
