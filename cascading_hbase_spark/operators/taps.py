"""Taps: source/sink endpoints for flows — the engine's re-expression
of Cascading's Tap/Scheme pairs (HBaseTap + HBaseScheme on one side,
Lfs/Hfs + TextLine/SequenceFile on the other; SURVEY.md §2.1).

Every tap exposes the identity/freshness protocol the cascade scheduler
needs: ``uri()`` (dependency key, cf. hbase:// URI
HBaseTap.java:142-148), ``exists()``, ``modified_time()``
(HBaseTap.java:65-67 'always stale' for keyed tables).
"""

from __future__ import annotations

import os
import shutil
import threading
import time
import weakref

from pyspark.sql import DataFrame, SparkSession

from cascading_hbase_spark.keyed.table import KeyedTable, SinkMode

__all__ = ["Tap", "ParquetTap", "TextLineTap", "CsvTap", "JsonTap", "KeyedTableTap",
           "PartitionedParquetTap", "MultiSourceTap", "SequenceFileTap", "SinkMode",
           "AdapterTap"]


class Tap:
    #: When True, a flow sinking into this tap is never considered
    #: up-to-date and always re-runs — the cascade-visible effect of
    #: HBaseTap.getPathModified returning currentTimeMillis
    #: (HBaseTap.java:65-67,103-105).
    always_stale_sink = False

    def __init__(self, path: str):
        self.path = path

    def uri(self) -> str:
        return f"file://{os.path.abspath(self.path)}"

    def exists(self) -> bool:
        return os.path.exists(self.path)

    def modified_time(self) -> float:
        if not self.exists():
            return -1.0
        mt = os.path.getmtime(self.path)
        if os.path.isdir(self.path):
            for f in os.listdir(self.path):
                mt = max(mt, os.path.getmtime(os.path.join(self.path, f)))
        return mt

    def delete(self) -> None:
        if os.path.isdir(self.path):
            shutil.rmtree(self.path)
        elif os.path.exists(self.path):
            os.remove(self.path)

    def read(self, spark: SparkSession) -> DataFrame:
        raise NotImplementedError

    def write(self, df: DataFrame, mode: SinkMode = SinkMode.REPLACE) -> None:
        raise NotImplementedError

    @staticmethod
    def _writer_mode(mode: SinkMode) -> str:
        return {
            SinkMode.APPEND: "append",
            SinkMode.REPLACE: "overwrite",
            SinkMode.KEEP: "errorifexists",
        }[mode]


class ParquetTap(Tap):
    def read(self, spark):
        return spark.read.parquet(self.path)

    def write(self, df, mode: SinkMode = SinkMode.REPLACE):
        df.write.mode(self._writer_mode(mode)).parquet(self.path)


class TextLineTap(Tap):
    """Line-oriented text file: one `line` string column (the Lfs +
    TextLine endpoint of every reference test,
    MultiFamilyHBaseTest.java:52,74-75)."""

    def read(self, spark):
        return spark.read.text(self.path).withColumnRenamed("value", "line")

    def write(self, df, mode: SinkMode = SinkMode.REPLACE):
        import pyspark.sql.functions as F

        if len(df.columns) == 1:
            out = df.select(F.col(df.columns[0]).cast("string").alias("value"))
        else:
            out = df.select(
                F.concat_ws("\t", *[F.col(c).cast("string") for c in df.columns]).alias("value")
            )
        out.write.mode(self._writer_mode(mode)).text(self.path)


class CsvTap(Tap):
    def __init__(self, path: str, header: bool = True, schema: str | None = None):
        super().__init__(path)
        self.header = header
        self.schema = schema

    def read(self, spark):
        r = spark.read.option("header", self.header)
        if self.schema:
            r = r.schema(self.schema)
        else:
            r = r.option("inferSchema", True)
        return r.csv(self.path)

    def write(self, df, mode: SinkMode = SinkMode.REPLACE):
        df.write.mode(self._writer_mode(mode)).option("header", self.header).csv(self.path)


class JsonTap(Tap):
    def read(self, spark):
        return spark.read.json(self.path)

    def write(self, df, mode: SinkMode = SinkMode.REPLACE):
        df.write.mode(self._writer_mode(mode)).json(self.path)


class OrcTap(Tap):
    """ORC source/sink (Spark-native columnar alternative to parquet;
    same predicate-pushdown and column-pruning behavior)."""

    def read(self, spark):
        return spark.read.orc(self.path)

    def write(self, df, mode: SinkMode = SinkMode.REPLACE):
        df.write.mode(self._writer_mode(mode)).orc(self.path)


class SequenceFileTap(Tap):
    """Hadoop SequenceFile of (key, value-tuple) pairs — the Cascading
    ``SequenceFile`` scheme (the binary tuple format the host framework
    pairs with ``TextLine``; SURVEY.md §2.1 [D] tap row).

    Rows serialize as (key string, JSON of the remaining fields): the
    same "first field is the key, the rest is the payload tuple" shape
    as the HBase scheme's key-prepended tuple (HBaseScheme.java:157-162).
    The declared ``schema`` (DDL for the non-key fields) makes reads
    schema-full like Cascading's declared-fields SequenceFile, not
    schema-on-read.  ``key_field`` may carry a dtype like a one-column
    DDL (``'num long'``): the key travels as a string on disk (Hadoop
    Text writable) but reads cast it back to the declared type, so the
    round-trip preserves the key's type like the payload columns'.  A
    bare name (``'num'``) keeps the legacy string-key contract.  The
    only RDD-API use in the engine — Spark has no DataFrame
    SequenceFile source; conversion in/out is one map."""

    def __init__(self, path: str, key_field: str, schema: str):
        super().__init__(path)
        parts = key_field.split(None, 1)
        self.key_field = parts[0]
        self.key_type = parts[1] if len(parts) > 1 else "string"
        self.schema = schema

    def read(self, spark):
        import pyspark.sql.functions as F

        # every write lands in its own batch-* subdir (the Hadoop output
        # committer refuses an existing dir, and this is what makes
        # APPEND a pure directory add)
        rdd = spark.sparkContext.sequenceFile(os.path.join(self.path, "batch-*"))
        raw = spark.createDataFrame(rdd, f"{self.key_field} string, _json string")
        return raw.select(
            F.col(self.key_field).cast(self.key_type).alias(self.key_field),
            F.from_json("_json", self.schema).alias("_s"),
        ).select(self.key_field, "_s.*")

    def write(self, df, mode: SinkMode = SinkMode.REPLACE):
        import uuid

        import pyspark.sql.functions as F

        if mode == SinkMode.KEEP and self.exists():
            raise FileExistsError(f"{self.path} exists and mode is KEEP")
        if mode == SinkMode.REPLACE:
            self.delete()
        payload = [c for c in df.columns if c != self.key_field]
        pairs = df.select(
            F.col(self.key_field).cast("string"),
            F.to_json(F.struct(*payload)),
        )
        out = os.path.join(self.path, f"batch-{uuid.uuid4().hex[:12]}")
        pairs.rdd.map(tuple).saveAsSequenceFile(out)


class KeyedTableTap(Tap):
    """The HBaseTap equivalent: keyed table with upsert semantics."""

    always_stale_sink = True

    def __init__(self, path: str, key: str = "key", seq_col: str | None = None,
                 start=None, stop=None, fields: list[str] | None = None,
                 family: str | None = None,
                 families: dict[str, str] | None = None):
        super().__init__(path)
        self.table = KeyedTable(path, key)
        self.seq_col = seq_col
        self.start, self.stop, self.fields = start, stop, fields
        # Per-scheme family selection on read / family map on create —
        # the multi-scheme binding of MultiFamilyHBaseTest.java:58-62.
        self.family = family
        self.families = families

    def uri(self) -> str:
        return self.table.uri()

    def exists(self) -> bool:
        return self.table.exists()

    def modified_time(self) -> float:
        # Always stale (HBaseTap.java:65-67,103-105): dependents re-run.
        return time.time()

    def delete(self) -> None:
        self.table.drop()

    def read(self, spark):
        return self.table.read(
            spark, self.start, self.stop, self.fields, self.family
        )

    def write(self, df, mode: SinkMode = SinkMode.APPEND):
        self.table.write(df, mode, self.seq_col, families=self.families)


class PartitionedParquetTap(Tap):
    """TemplateTap analogue (Cascading 1.x ``TemplateTap`` routed each
    tuple to a path derived from field values): Spark expresses the
    same contract as a Hive-partitioned parquet layout —
    ``partitionBy(cols)`` on write fans tuples into
    ``<col>=<value>/...`` directories, and reads prune those
    directories when the partition columns are filtered (dynamic
    partition pruning at scale)."""

    def __init__(self, path: str, partition_cols: list[str]):
        super().__init__(path)
        if not partition_cols:
            raise ValueError("partition_cols must be non-empty")
        self.partition_cols = list(partition_cols)

    def read(self, spark):
        return spark.read.parquet(self.path)

    def write(self, df, mode: SinkMode = SinkMode.REPLACE):
        missing = [c for c in self.partition_cols if c not in df.columns]
        if missing:
            raise ValueError(f"partition columns {missing} not in dataframe")
        (
            df.write.mode(self._writer_mode(mode))
            .partitionBy(*self.partition_cols)
            .parquet(self.path)
        )


class MultiSourceTap(Tap):
    """Cascading's ``MultiSourceTap``: several source taps read as one
    relation (union by column name).  Freshness/identity aggregate over
    the members, so the cascade scheduler re-runs dependents when ANY
    member changes."""

    def __init__(self, taps: list[Tap]):
        if not taps:
            raise ValueError("MultiSourceTap needs at least one member tap")
        super().__init__(";".join(t.path for t in taps))
        self.taps = list(taps)

    def uri(self) -> str:
        return "multi:[" + ",".join(t.uri() for t in self.taps) + "]"

    def exists(self) -> bool:
        return all(t.exists() for t in self.taps)

    def modified_time(self) -> float:
        return max(t.modified_time() for t in self.taps)

    def delete(self) -> None:
        for t in self.taps:
            t.delete()

    def read(self, spark):
        dfs = [t.read(spark) for t in self.taps]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def write(self, df, mode: SinkMode = SinkMode.REPLACE):
        raise NotImplementedError("MultiSourceTap is a source-only tap")


# process-monotonic fallback name for pathless adapters (never reused,
# unlike id()) — see AdapterTap.__init__
_ADAPTER_SEQ = [0]
_ADAPTER_SEQ_LOCK = threading.Lock()

# Slotted pathless adapters cannot carry the token attribute, so their
# uri derives from id() — which is only safe while the object stays
# alive (CPython recycles id() after GC).  Pinning the adapter here
# makes the id permanent: WeakSet when the class supports weak refs
# (the pin — and the hazard — dies with the adapter), strong set
# otherwise (bounded by the count of distinct slotted pathless
# adapters, which are connector singletons in practice).  r10 ADVICE:
# without the stable id-based fallback, two taps wrapping the SAME
# slotted adapter minted different uris and the cascade scheduler
# silently missed their producer/consumer edge.
_SLOTTED_PINS: weakref.WeakSet = weakref.WeakSet()
_SLOTTED_PINS_STRONG: set = set()


class AdapterTap(Tap):
    """Bind ANY ``KeyedStoreAdapter`` implementation into the flow/
    cascade surface — the generalized HBaseTap: the reference's tap
    was hard-wired to one store (HBase); this one takes the connector
    as a parameter, so a cascade can source from / sink into an
    external keyed store (HBase via Spark's HBase integration,
    Cassandra, a JDBC MERGE target) with the exact Tap semantics the
    engine's own keyed tables get:

    - sink modes: KEEP fails on an existing store, REPLACE drops and
      recreates, APPEND upserts last-write-wins (HBaseTap.java:32-40,
      123-128);
    - always-stale sink: dependents of a keyed sink re-run every
      cascade pass (HBaseTap.java:65-67,103-105);
    - reads are pruned range scans with projection, per the adapter
      contract.
    """

    always_stale_sink = True

    def __init__(self, adapter, name: str | None = None,
                 start=None, stop=None, fields: list[str] | None = None):
        # the adapter may have no filesystem path; the tap's identity
        # is a logical name (cf. hbase://tableName, HBaseTap.java:142-148).
        # The fallback must be unique per ADAPTER, not a constant: the
        # cascade scheduler keys producers/consumers by uri(), and two
        # pathless adapters sharing 'adapter://adapter' would silently
        # cross-link unrelated flows (r09 review finding).  It must
        # also be STABLE per adapter — two taps wrapping the SAME
        # pathless adapter are the same store, and the scheduler's
        # producer/consumer edge depends on their uris matching — and
        # never reused, which rules out id(): CPython recycles id()
        # after GC (r09 ADVICE).  So: a process-monotonic token minted
        # once per adapter and CACHED ON the adapter object (it dies
        # with the adapter, never outlives it into a reused id).
        fallback = getattr(adapter, "path", None)
        if not fallback:
            # check-and-mint under ONE lock: two threads constructing
            # taps over the same adapter must agree on the token
            with _ADAPTER_SEQ_LOCK:
                fallback = getattr(adapter, "_chs_uri_token", None)
                if not fallback:
                    _ADAPTER_SEQ[0] += 1
                    fallback = f"adapter-{_ADAPTER_SEQ[0]}"
                    try:
                        adapter._chs_uri_token = fallback
                    except AttributeError:
                        # __slots__-style adapter cannot carry the
                        # token: derive it from id() — stable for a
                        # live object, so two taps over the SAME
                        # adapter agree and the scheduler keeps its
                        # producer/consumer edge — and PIN the adapter
                        # so the id can never be recycled into a
                        # different adapter (r10 ADVICE; the 'slotted'
                        # infix keeps the namespace disjoint from the
                        # seq tokens).
                        fallback = f"adapter-slotted-{id(adapter):x}"
                        try:
                            _SLOTTED_PINS.add(adapter)
                        except TypeError:
                            _SLOTTED_PINS_STRONG.add(adapter)
        super().__init__(name or fallback)
        self.adapter = adapter
        self._name = name or fallback
        self.start, self.stop, self.fields = start, stop, fields

    def uri(self) -> str:
        return f"adapter://{self._name}"

    def exists(self) -> bool:
        return self.adapter.exists()

    def modified_time(self) -> float:
        # Always stale (HBaseTap.java:65-67): dependents re-run.
        return time.time()

    def delete(self) -> None:
        self.adapter.drop()

    def read(self, spark):
        return self.adapter.scan(spark, self.start, self.stop, self.fields)

    def write(self, df, mode: SinkMode = SinkMode.APPEND):
        if mode is SinkMode.KEEP:
            if self.adapter.exists():
                raise FileExistsError(
                    f"adapter store already exists (SinkMode.KEEP): {self.uri()}"
                )
            self.adapter.create(df)
        elif mode is SinkMode.REPLACE:
            self.adapter.drop()
            self.adapter.create(df)
        else:
            self.adapter.upsert(df)
