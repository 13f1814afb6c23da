"""Structured Streaming SOURCE over a keyed table's changefeed — the
CDC loop's missing quadrant (batch feeds exist via ``changefeed_keyed``
and replicas pull them; this lets ANY downstream streaming query
subscribe to a table's changes).

Spark-first architecture: a PySpark 4 Python DataSource
(``pyspark.sql.datasource``) whose STREAM OFFSETS are the keyed
table's manifest commit versions.  Generations are immutable, so
replaying an offset interval is deterministic — the file-source-grade
exactly-once contract falls out of the storage design instead of
needing a dedup layer.  The HBase analogue the reference relied on is
cluster-level WAL shipping (its deployments subscribed via HBase
replication, ``HBaseTap.java:69-93`` holds only a client admin
connection); here the manifest history IS the WAL.

Scale design:

- ``partitions(start, end)`` plans ONE partition per changed bucket
  key-range: buckets whose generation pointer and boundaries are
  identical at both offsets are skipped entirely, so a micro-batch
  costs O(touched buckets), not O(table) — the same pruning the
  engine's upsert write path gets.
- planning resolves everything control-plane-flavored (manifest
  history, file listings, the registered version-token column) on the
  DRIVER; each ``InputPartition`` ships only final parquet file paths
  + a key range, so executor-side ``read()`` touches the DATA plane
  alone (pure Arrow, no Spark, no control plane).
- the per-partition diff mirrors ``changefeed_keyed``'s semantics:
  one row per key whose PAYLOAD changed, ``_change`` in
  {'insert','update','delete'} (deletes carry the pre-delete row),
  and the version-token column registered AT the end offset excluded
  from change detection (an idempotent re-ingest is silent).

Contract notes (each enforced or documented below): the output schema
is pinned at stream start (columns added by later additive evolution
join the feed only after a restart); TTL tables are refused (TTL
filtering is wall-clock-dependent — replay would not be
deterministic); a start offset older than the vacuum/retention horizon
raises the standard rebuild signal instead of diffing partial data.

Plane note (r12): planning routes every manifest/history read through
a ``ControlPlane`` the planning worker REBUILDS from the ``plane``
reader option — ``read_changefeed_stream`` ships the driver plane's
``plane_spec()`` there, exactly how every Spark connector passes
endpoint/credentials to its tasks.  The default spec rebuilds the
local-FS plane (plain file reads, the historical behavior); the
file-backed object-store plane rebuilds from its shared root, so
``KT_PLANE=objectstore`` covers streaming CDC end-to-end; only the
process-local in-memory emulation has no spec and is refused at
stream creation.  DATA files (parquet) stay on whatever path Spark's
executors read — the hybrid split every real deployment has.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StringType, StructField, StructType

SOURCE_NAME = "keyed_changefeed"
CHANGE_COL = "_change"
BEFORE_COL = "_before"


def _truthy(v) -> bool:
    return str(v).lower() in ("1", "true", "yes") if v is not None else False

# ---------------------------------------------------------------------------
# planning helpers — manifest access through a control plane the
# PLANNING WORKER rebuilds from the ``plane`` reader option (r12,
# VERDICT r11 item 2).  The worker is a separate Python process, so
# the driver's installed plane is ipso facto invisible; the driver
# ships ``ControlPlane.plane_spec()`` through the option and the
# worker rebuilds an equivalent plane — a fresh local-FS plane by
# default, a file-backed object-store plane under KT_PLANE=objectstore,
# an SDK client from endpoint/credentials in a real cloud port.
# ---------------------------------------------------------------------------


def _plane_of(options: dict):
    spec = options.get("plane")
    from cascading_hbase_spark.keyed.controlplane import (
        LocalFSControlPlane,
        plane_from_spec,
    )

    if spec:
        return plane_from_spec(json.loads(spec))
    return LocalFSControlPlane()  # historical default: plain file reads


def _load_manifest(cp, path: str) -> dict:
    return cp.read_json(os.path.join(path, "_kt_meta.json"))


def _load_history(cp, path: str, version: int) -> dict:
    hp = os.path.join(path, "_kt_history", f"v{version}.json")
    try:
        return cp.read_json(hp)
    except FileNotFoundError:
        raise RuntimeError(
            f"keyed table {path}: manifest snapshot v{version} is no "
            f"longer in the commit log (HISTORY_KEEP pruning); restart "
            f"the changefeed stream from a retained version"
        ) from None


def _horizon(meta: dict) -> int:
    return max(
        meta.get("version", 1) - meta.get("retain", 2) + 1,
        meta.get("vacuum_horizon", 1),
    )


def _gen_files(path: str, bucket: int, gen: int) -> list[str]:
    d = os.path.join(path, f"_kt_bucket={bucket}", f"_kt_gen={gen}")
    try:
        names = os.listdir(d)
    except (FileNotFoundError, NotADirectoryError):
        return []
    return sorted(
        os.path.join(d, n)
        for n in names
        if n.endswith(".parquet") and not n.startswith(("_", "."))
    )


# Key-range arithmetic and the cross-re-bucket pruning walk are shared
# with the batch diff (keyed/cdc_prune.py — pure Python over manifest
# dicts, safe to import in the planning worker: no Spark, no control
# plane).
from cascading_hbase_spark.keyed.cdc_prune import (  # noqa: E402
    overlapping_buckets as _overlapping_buckets,
    bucket_range as _bucket_range,
    prune_across_rebucket as _prune_across_rebucket,
)


# ---------------------------------------------------------------------------
# executor-side diff (vectorized Arrow — no Spark, no control plane,
# no per-row Python: files read as Arrow tables, the key-range filter
# and payload comparison are columnar, and results stream back to the
# JVM as RecordBatches)
# ---------------------------------------------------------------------------


def _side_table(files: list[str], data_schema, key: str, lo, hi):
    """One side of the diff as a single Arrow table in ``data_schema``
    (columns a file predates — additive evolution — materialize as
    typed nulls), restricted to keys in [lo, hi)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    parts = []
    for f in files:
        pf = pq.ParquetFile(f)
        have = set(pf.schema_arrow.names)
        t = pf.read(columns=[c for c in data_schema.names if c in have])
        cols = {
            field.name: (
                t[field.name].cast(field.type)
                if field.name in t.column_names
                else pa.nulls(len(t), type=field.type)
            )
            for field in data_schema
        }
        parts.append(pa.table(cols, schema=data_schema))
    t = pa.concat_tables(parts) if parts else data_schema.empty_table()
    if lo is not None:
        t = t.filter(pc.greater_equal(t[key], pa.scalar(lo)))
    if hi is not None:
        t = t.filter(pc.less(t[key], pa.scalar(hi)))
    return t


def _eq_nan(x, y) -> bool:
    """Python-value equality with Spark's eqNullSafe NaN rule (NaN
    equals NaN), applied recursively through lists/structs — the
    elementwise fallback for nested columns must not diverge from the
    flat path's semantics."""
    if x is y:
        return True
    if isinstance(x, float) and isinstance(y, float):
        return x == y or (x != x and y != y)
    if isinstance(x, list) and isinstance(y, list):
        return len(x) == len(y) and all(_eq_nan(a, b) for a, b in zip(x, y))
    if isinstance(x, dict) and isinstance(y, dict):
        return x.keys() == y.keys() and all(
            _eq_nan(v, y[k]) for k, v in x.items()
        )
    return x == y


class _DiffPartition(InputPartition):
    def __init__(self, spec: dict):
        self.spec = spec


# ---------------------------------------------------------------------------
# the source
# ---------------------------------------------------------------------------


class KeyedChangefeedStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("keyed_changefeed requires .option('path', ...)")
        self.include_old = _truthy(options.get("include_old"))
        self._options = dict(options)
        meta = _load_manifest(self._cp(), self.path)
        if self.include_old and not [
            f for f in schema.fields
            if f.name not in (CHANGE_COL, BEFORE_COL)
            and f.name != meta["key"]
        ]:
            raise ValueError(
                f"keyed table {self.path} has no payload columns beside "
                f"the key; include_old has no pre-image to carry"
            )
        if CHANGE_COL not in schema.fieldNames():  # normalize direct use
            schema = StructType(
                list(schema.fields)
                + [StructField(CHANGE_COL, StringType(), False)]
            )
        if self.include_old and BEFORE_COL not in schema.fieldNames():
            data_fields = [
                f for f in schema.fields
                if f.name not in (CHANGE_COL, BEFORE_COL)
                and f.name != meta["key"]
            ]
            schema = StructType(
                list(schema.fields)
                + [StructField(BEFORE_COL, StructType(data_fields), True)]
            )
        self._schema = schema  # pinned at stream start (incl. _change)
        self.columns = [
            f.name for f in schema.fields
            if f.name not in (CHANGE_COL, BEFORE_COL)
        ]
        if meta.get("ttl"):
            raise ValueError(
                f"keyed table {self.path} has a row-TTL policy; TTL "
                f"filtering is wall-clock-dependent, so a changefeed "
                f"stream over it could not replay deterministically — "
                f"subscribe to a TTL-free table (e.g. a replica without "
                f"the policy) instead"
            )
        self.key = meta["key"]
        fv = options.get("from_version")
        self._initial = int(fv) if fv is not None else meta.get("version", 1)

    # -- plane (rebuilt per process; never pickled) ---------------------

    def _cp(self):
        cp = getattr(self, "_cp_cache", None)
        if cp is None:
            cp = self._cp_cache = _plane_of(self._options)
        return cp

    def __getstate__(self):
        # the plane holds process-local state (locks); every process
        # (driver, planning worker, executor) rebuilds its own from
        # the serializable spec in _options
        d = dict(self.__dict__)
        d.pop("_cp_cache", None)
        return d

    # -- offsets: manifest commit versions ------------------------------

    def initialOffset(self) -> dict:
        return {"version": self._initial}

    def latestOffset(self) -> dict:
        # A live writer flips the manifest BEFORE writing the history
        # snapshot (keyed/table.py _commit_manifest order), so the
        # freshest version's history document can lag the pointer by a
        # moment.  Planning needs that document; advancing the offset
        # onto it would kill the stream with a spurious "pruned" error
        # (r10 review).  Clamp to the newest version whose snapshot is
        # already readable — the lagging commit is picked up next poll.
        cp = self._cp()
        v = _load_manifest(cp, self.path).get("version", 1)
        while v > self._initial and not cp.object_exists(
            os.path.join(self.path, "_kt_history", f"v{v}.json")
        ):
            v -= 1
        return {"version": v}

    def commit(self, end: dict) -> None:
        # retention is the table's own vacuum/retain policy; the source
        # keeps no state of its own (offsets live in the checkpoint)
        pass

    # -- planning --------------------------------------------------------

    def _history_or_none(self, version: int) -> dict | None:
        """Manifest snapshot for an INTERMEDIATE version of the pruning
        walk — None (not an error) when pruned from the commit log:
        the walk then falls back to the full diff, unlike the
        endpoints, whose absence is fatal (``_load_history``)."""
        try:
            return self._cp().read_json(
                os.path.join(self.path, "_kt_history", f"v{version}.json")
            )
        except (FileNotFoundError, NotADirectoryError, ValueError):
            return None

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        v0, v1 = int(start["version"]), int(end["version"])
        if v1 <= v0:
            return []
        cp = self._cp()
        cur = _load_manifest(cp, self.path)
        if v0 < _horizon(cur):
            raise RuntimeError(
                f"keyed table {self.path}: changefeed start generation "
                f"{v0} is older than the readable horizon "
                f"{_horizon(cur)} (retain/vacuum); restart the stream "
                f"from a retained version"
            )
        old = _load_history(cp, self.path, v0)
        new = _load_history(cp, self.path, v1)
        seq_col = new.get("seq_col")  # registration in effect AT v1
        ob, nb = old.get("boundaries", []), new.get("boundaries", [])
        ogens, ngens = old.get("gens", {}), new.get("gens", {})
        # New-side buckets that can contain CHANGED keys.  Same
        # boundaries: the pointer diff directly.  Across a re-bucket:
        # the shared history walk maps every segment's touched key
        # ranges into v1's bucket space (None = unprovable — plan the
        # full diff), so a micro-batch stays O(touched buckets) even
        # when a re-bucketing compaction landed inside its offset
        # interval (VERDICT r11 item 1).
        if ob == nb:
            need = {
                int(b)
                for b in set(ogens) | set(ngens)
                if ogens.get(b) != ngens.get(b)
            }
        else:
            pruned = _prune_across_rebucket(
                v0, old, v1, new,
                lambda v: self._history_or_none(v),
            )
            need = None if pruned is None else pruned[1]
        parts: list[InputPartition] = []
        for b in range(len(nb) + 1):
            if need is not None and b not in need:
                # no touched key range intersects this bucket: provably
                # diff-free, skipped without listing a single file
                continue
            lo, hi = _bucket_range(nb, b)
            obuckets = _overlapping_buckets(ob, lo, hi)
            old_files = [
                f
                for b2 in obuckets
                if str(b2) in ogens
                for f in _gen_files(self.path, b2, ogens[str(b2)])
            ]
            new_files = (
                _gen_files(self.path, b, ngens[str(b)])
                if str(b) in ngens
                else []
            )
            if not old_files and not new_files:
                continue
            parts.append(
                _DiffPartition(
                    {
                        "lo": lo,
                        "hi": hi,
                        "old_files": old_files,
                        "new_files": new_files,
                        "key": self.key,
                        "seq_col": seq_col,
                    }
                )
            )
        return parts

    # -- executor read ----------------------------------------------------

    def read(self, partition: InputPartition):
        """Vectorized per-key-range diff, returned as Arrow
        RecordBatches (never per-row Python): both sides load as Arrow
        tables, the join runs on Arrow-backed pandas (``ArrowDtype``
        keeps ints exact under nulls — no float coercion), and the
        null-safe payload comparison is columnar."""
        import pandas as pd
        import pyarrow as pa

        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import StructType as _ST

        import pyarrow.types as pat

        s = partition.spec
        key, seq = s["key"], s["seq_col"]
        cols = self.columns  # one source of truth: the pinned schema
        out_schema = to_arrow_schema(self._schema)
        data_schema = to_arrow_schema(
            _ST([
                f for f in self._schema.fields
                if f.name not in (CHANGE_COL, BEFORE_COL)
            ])
        )
        old = _side_table(
            s["old_files"], data_schema, key, s["lo"], s["hi"]
        ).to_pandas(types_mapper=pd.ArrowDtype)
        new = _side_table(
            s["new_files"], data_schema, key, s["lo"], s["hi"]
        ).to_pandas(types_mapper=pd.ArrowDtype)
        # collision-proof internal names: any legal user column may be
        # called _merge / <col>__old (r10 review #3)
        ind = "_chs_merge"
        while ind in cols:
            ind += "_"
        suf = "__chs_old"
        while any((c + suf) in cols for c in cols):
            suf += "_"
        m = new.merge(
            old, on=key, how="outer", suffixes=("", suf), indicator=ind
        )
        payload = [c for c in cols if c != key and c != seq]
        nested = {f.name for f in data_schema if pat.is_nested(f.type)}
        floating = {f.name for f in data_schema if pat.is_floating(f.type)}
        changed = pd.Series(False, index=m.index)
        for c in payload:
            a, b = m[c], m[c + suf]
            if c in nested:
                # Arrow has no not_equal kernel for list/struct columns
                # — elementwise Python for THESE columns only (flat
                # columns stay columnar), with the same NaN-equals-NaN
                # rule as the flat path (r10 review #4)
                changed = changed | pd.Series(
                    [not _eq_nan(x, y) for x, y in zip(a.tolist(), b.tolist())],
                    index=m.index,
                )
                continue
            # null-safe equality matching the batch feed's eqNullSafe:
            # unequal non-nulls OR exactly one side null
            neq = (a != b).fillna(False) | (a.isna() ^ b.isna())
            if c in floating:
                # ...and NaN equals NaN (Spark's <=> does; IEEE !=
                # would emit a spurious update every touched batch).
                # Float columns only — elsewhere (a != a) is a
                # guaranteed all-False compare, wasted on the hot path
                neq = neq & ~((a != a).fillna(False) & (b != b).fillna(False))
            changed = changed | neq
        frames = []
        befores = []  # old-side payloads, row-aligned with frames
        before_null = []  # True per row = whole _before struct is NULL
        bcols = [c for c in cols if c != key]
        # pre-image accumulation is paid ONLY when the stream asked for
        # it: the pandas column materialization below is per-batch work
        # that a plain (no include_old) subscriber never consumes
        want_old = self.include_old

        def _old_payload(sel) -> "pd.DataFrame":
            return pd.DataFrame({c: m.loc[sel, c + suf] for c in bcols})

        ins = m[ind] == "left_only"
        if ins.any():
            frames.append(m.loc[ins, cols].assign(**{CHANGE_COL: "insert"}))
            # inserts have no pre-image: a NULL struct, like the batch
            # feed's include_old (_old is null on the left_only side)
            if want_old:
                befores.append(_old_payload(ins))
                before_null.extend([True] * int(ins.sum()))
        upd = (m[ind] == "both") & changed
        if upd.any():
            frames.append(m.loc[upd, cols].assign(**{CHANGE_COL: "update"}))
            if want_old:
                befores.append(_old_payload(upd))
                before_null.extend([False] * int(upd.sum()))
        dels = m[ind] == "right_only"
        if dels.any():  # pre-delete row, like the batch feed
            old_cols = {
                c: m.loc[dels, c if c == key else c + suf] for c in cols
            }
            frames.append(
                pd.DataFrame(old_cols).assign(**{CHANGE_COL: "delete"})
            )
            if want_old:
                befores.append(_old_payload(dels))
                before_null.extend([False] * int(dels.sum()))
        if not frames:
            return iter(())
        data_out = pa.schema(
            [out_schema.field(c) for c in cols]
            + [out_schema.field(CHANGE_COL)]
        )
        out = pa.Table.from_pandas(
            pd.concat(frames, ignore_index=True),
            schema=data_out,
            preserve_index=False,
        )
        if self.include_old:
            # pre-image struct column, columnar like the rest: the old
            # side's payload columns assembled into one StructArray
            # (child values at NULL-struct slots are ignored via mask)
            bfields = [data_schema.field(c) for c in bcols]
            btab = pa.Table.from_pandas(
                pd.concat(befores, ignore_index=True),
                schema=pa.schema(bfields),
                preserve_index=False,
            )
            struct = pa.StructArray.from_arrays(
                [btab.column(f.name).combine_chunks() for f in bfields],
                fields=bfields,
                mask=pa.array(before_null, type=pa.bool_()),
            )
            out = out.append_column(out_schema.field(BEFORE_COL), struct)
        return iter(out.to_batches())


class KeyedChangefeedDataSource(DataSource):
    """``spark.readStream.format("keyed_changefeed")`` — see module
    docstring.  Options: ``path`` (the keyed table), ``from_version``
    (starting cursor; default = the table's version at stream start,
    i.e. future changes only), ``include_old`` ("true" appends a
    ``_before`` struct carrying every non-key column's pre-image —
    null for inserts, mirroring the batch feed's ``include_old=True``
    — what incremental aggregate maintenance needs to retract an
    update's old contribution)."""

    @classmethod
    def name(cls) -> str:
        return SOURCE_NAME

    def schema(self) -> StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError("keyed_changefeed requires .option('path', ...)")
        meta = _load_manifest(_plane_of(dict(self.options)), path)
        st = StructType.fromJson(json.loads(meta["schema"]))
        fields = list(st.fields) + [
            StructField(CHANGE_COL, StringType(), False)
        ]
        if _truthy(self.options.get("include_old")):
            fields.append(
                StructField(
                    BEFORE_COL,
                    StructType(
                        [f for f in st.fields if f.name != meta["key"]]
                    ),
                    True,
                )
            )
        return StructType(fields)

    def streamReader(self, schema: StructType) -> KeyedChangefeedStreamReader:
        return KeyedChangefeedStreamReader(schema, dict(self.options))
