"""Structured Streaming surface (SURVEY.md §2.10).

The reference is pure batch MapReduce; its buffered upsert sink
(``TableOutputFormatWrap.java:40,66-69`` — auto-flush off, flush on
close) is the moral ancestor of a micro-batch streaming upsert.  This
module binds the engine's batch transformations to streams:

- the window/dedup transforms are written against a plain DataFrame, so
  the *same function* serves batch (DuckDB-checkable) and streaming
  (``readStream``) inputs — one semantics, two execution modes;
- the keyed upsert sink is ``foreachBatch`` + ``write_keyed`` (the
  last-write-wins merge of ``HBaseScheme.java:109-128`` per
  micro-batch);
- the custom stateful operator uses ``applyInPandasWithState`` (Arrow
  batches + managed per-key state) — the streaming form of Cascading's
  ``Buffer`` (per-group iterator, SURVEY.md §2.9).

Scale notes: watermarks bound state; the stateful op shuffles once on
its grouping key; the upsert sink merges per micro-batch (incremental,
not full-rewrite-per-row).
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Iterator
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from cascading_hbase_spark.keyed.table import SinkMode, write_keyed

__all__ = [
    "events_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
    "dedup_within_watermark",
    "interval_join_clicks_to_purchases",
    "running_user_totals",
    "running_totals_by",
    "exactly_once_ingest",
    "session_close_on_timeout",
    "run_available_now",
    "stream_upsert_keyed",
    "stream_replica",
    "stream_matview",
    "stream_index",
    "documents_stream",
    "stream_ingest_dedup",
]

DEC = "decimal(18,2)"

# events.parquet's ts physical type varies by how the driver generated
# the file: TIMESTAMP(NANOS) (read as long under nanosAsLong) or
# TIMESTAMP_NTZ micros.  The stream source needs a declared schema, so
# probe the footer with a batch read once and build the matching
# (schema, ts-normalization) pair — both normalize to session-UTC
# TIMESTAMP exactly like catalog.load_table.
_EVENTS_RAW_NANOS = (
    "event_id long, ts long, user_id long, "
    "event_type string, value double, props string"
)
_EVENTS_RAW_NTZ = (
    "event_id long, ts timestamp_ntz, user_id long, "
    "event_type string, value double, props string"
)


def _as_stream_dir(path: str) -> str:
    """The file stream source lists a *directory* of arriving files; a
    bare parquet file (the test fixture) gets wrapped in a scratch dir
    via symlink.  At scale the input is a landing directory already."""
    if os.path.isdir(path):
        return path
    d = tempfile.mkdtemp(prefix="chs_stream_src_")
    os.symlink(path, os.path.join(d, os.path.basename(path)))
    return d


def events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Bind the events table as a file-source stream (micro-batched
    scan of new parquet files — at scale, a landing directory)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    # Footer probe: what does the batch reader see for ts?
    nanos = dict(spark.read.parquet(path).dtypes).get("ts") == "bigint"
    reader = spark.readStream.schema(_EVENTS_RAW_NANOS if nanos else _EVENTS_RAW_NTZ)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(_as_stream_dir(path))
    if nanos:
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


# ---------------------------------------------------------------------------
# Transformations: one definition for batch AND streaming inputs.
# ---------------------------------------------------------------------------

def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts/sums per event_type; watermark bounds
    state and admits late data up to ``watermark``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("value_sum"),
        )
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "value_sum")
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("value_sum"),
        )
        .select(F.col("w.start").alias("w_start"), "n", "value_sum")
    )


def session_counts(
    events: DataFrame, gap: str = "10 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows (gap-merged state on the streaming
    path, same semantics as the batch gaps-and-islands oracle)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n_events"), F.max("ts").alias("last_event"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "last_event",
            "n_events",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming dedup: first event per key within the watermark
    horizon, with per-key state actually DROPPED once the watermark
    passes — ``dropDuplicatesWithinWatermark``, not plain
    ``dropDuplicates``: with a key-only subset the latter never evicts
    its state (Spark ties eviction to an event-time column in the
    subset), so a long-running ingest would grow state per key ever
    seen until OOM (r09 review finding).  The honest contract of the
    bounded-state form: a duplicate arriving AFTER the watermark passed
    its key's state re-emits (at-least-once beyond the horizon), which
    is the right trade for an ingest pipeline — bounded state, no
    silent late-row loss."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        [*keys]
    )


def interval_join_clicks_to_purchases(
    clicks: DataFrame,
    purchases: DataFrame,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: every purchase matched to the same
    user's clicks in the preceding ``lookback`` — the attribution-join
    shape.  Both sides carry watermarks and the join condition bounds
    event time on both ends, so each side's buffered state is dropped
    once the watermark passes (state is O(rows within the horizon), not
    O(stream)).  Inner join -> deterministic row set, batch-checkable.

    ``how='leftOuter'`` additionally emits click-less purchases with a
    NULL click side — but only once the watermark passes the purchase's
    event time (the engine must be sure no matching click can still
    arrive).  Under ``availableNow`` replay the final watermark stops
    ``watermark`` short of the max event time, so tail purchases inside
    that horizon never emit their null row: the outer result is the
    inner result plus null-matches for WATERMARK-EXPIRED unmatched
    purchases only (contract-tested, not oracle-hashable)."""
    c = (
        clicks.select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", watermark)
    )
    p = (
        purchases.select(
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {lookback}")),
        how,
    ).select("user_id", "purchase_id", "click_id", "purchase_ts", "click_ts")


def enriched_segment_revenue(
    events: DataFrame,
    customer: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-static enrichment: the event stream broadcast-joined to a
    static customer dimension (re-read per micro-batch, never stateful),
    then a watermarked tumbling rollup per market segment.  The dim side
    is broadcast, so the stream is never shuffled for the join — the only
    stateful shuffle keys on (window, segment)."""
    dim = F.broadcast(
        customer.select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    return (
        events.withWatermark("ts", watermark)
        .join(dim, "user_id")
        .groupBy(F.window("ts", window).alias("w"), "c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("value_sum"),
        )
        .select(F.col("w.start").alias("w_start"), "c_mktsegment", "n", "value_sum")
    )


# ---------------------------------------------------------------------------
# Custom stateful operator (the Buffer escape hatch, streaming form).
# ---------------------------------------------------------------------------

def running_totals_by(
    events: DataFrame, keys: tuple[str, ...] = ("user_id",)
) -> DataFrame:
    """Running totals per composite key via ``applyInPandasWithState``:
    managed per-key state, Arrow-batched UDF, update-mode emission per
    batch.  ``keys`` is any tuple of grouping columns — the output
    schema carries the key columns (types taken from the input schema)
    plus ``n_events``/``value_sum``.

    The state accumulates integer CENTS (the DECIMAL(18,2) cast happens
    JVM-side before the UDF), so the running total is exact and
    independent of arrival/accumulation order — the final emission per
    key equals the batch ``SUM(CAST(value AS DECIMAL(18,2)))`` to the
    bit, making the stateful path oracle-checkable rather than
    'approximately right up to float re-association'."""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    out_schema = StructType(
        [StructField(k, events.schema[k].dataType) for k in keys]
        + [
            StructField("n_events", LongType()),
            StructField("value_sum", DoubleType()),
        ]
    )

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int(pdf["cents"].sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {
                **{k: [key[i]] for i, k in enumerate(keys)},
                "n_events": [n],
                "value_sum": [cents / 100.0],
            }
        )

    with_cents = events.withColumn(
        "cents",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long"),
    )
    return with_cents.groupBy(*keys).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="n long, cents long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals — ``running_totals_by`` keyed on
    ``user_id`` alone (kept as the named single-key form the tests and
    ``streaming_stateful_totals_final`` exercise)."""
    return running_totals_by(events, ("user_id",))


def exactly_once_ingest(
    primary: DataFrame,
    replay: DataFrame,
    id_col: str = "event_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """At-least-once delivery made exactly-once (within the horizon):
    union the primary stream with a redelivered copy (retries,
    replayed landing files) and keep the first arrival per unique
    ``id_col`` within the watermark.  Redeliveries are byte-identical
    rows, so unlike content-keyed dedup the emitted ROW CONTENT is
    deterministic: every unique id emits exactly once with its full
    payload, and state is one entry per id inside the horizon (see
    ``dedup_within_watermark`` for the eviction contract this reuses —
    a redelivery arriving after the horizon re-emits rather than
    growing state forever)."""
    return dedup_within_watermark(
        primary.unionByName(replay), keys=(id_col,), watermark=watermark
    )



def session_close_on_timeout(
    events: DataFrame, gap_seconds: int = 30, watermark: str = "1 minute"
) -> DataFrame:
    """Per-user session totals emitted ONLY when the session closes —
    ``applyInPandasWithState`` with an EVENT-TIME TIMEOUT: each batch
    extends the user's state and re-arms a timeout at (last event time
    + gap); when the watermark passes that point with no new events,
    the state times out, the closed-session row is emitted (append
    mode) and the state is removed.  The timeout path is the one piece
    of the stateful API ``running_user_totals`` (NoTimeout, update
    mode) does not exercise.

    State is integer cents + event-time micros, so the emitted totals
    are exact and replay-stable."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, cents, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "value_sum": [cents / 100.0],
                    "last_event_us": [last_us],
                }
            )
            return
        n, cents, last_us = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int(pdf["cents"].sum())
            last_us = max(last_us, int(pdf["us"].max()))
        state.update((n, cents, last_us))
        # timeout timestamp is epoch MILLIS in event time
        state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)
        yield from ()

    prepared = (
        events.withWatermark("ts", watermark)
        .withColumn(
            "cents", (F.col("value").cast("decimal(18,2)") * 100).cast("long")
        )
        .withColumn("us", F.unix_micros("ts"))
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id long, n_events long, value_sum double, last_event_us long"
        ),
        stateStructType="n long, cents long, last_us long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Sinks / runners.
# ---------------------------------------------------------------------------

_MEMORY_SINK_SEQ = [0]


def run_available_now(
    result: DataFrame, output_mode: str = "complete", query_name: str | None = None
) -> DataFrame:
    """Execute a streaming DataFrame to completion over all currently
    available input (``Trigger.AvailableNow``) into a memory sink and
    return the materialized result table.

    Streaming has no AQE partition coalescing: under a default session
    every stateful op would run 200 shuffle/state-store partitions
    regardless of data volume.  The shuffle width is pinned to the
    session's parallelism for the duration of the run and restored
    after — state scales with keys, not partitions, so at cluster
    scale defaultParallelism is the right order of magnitude too."""
    if query_name is None:
        _MEMORY_SINK_SEQ[0] += 1
        query_name = f"chs_stream_{_MEMORY_SINK_SEQ[0]}"
    spark = result.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(spark.sparkContext.defaultParallelism),
    )
    try:
        q = (
            result.writeStream.format("memory")
            .queryName(query_name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(query_name)


def stream_upsert_keyed(
    events: DataFrame,
    path: str,
    key: str,
    checkpoint: str,
    available_now: bool | None = None,
    processing_time: str | None = None,
    expectations: list | None = None,
    quarantine_path: str | None = None,
) -> StreamingQuery:
    """Streaming keyed upsert sink: each micro-batch merges
    last-write-wins into the keyed table — the engine's
    ``TableOutputFormatWrap`` (buffered Puts flushed per batch).

    Trigger selection: with neither argument the query drains the
    currently-available input and terminates (availableNow — the
    replay/test mode).  ``processing_time='5 seconds'`` alone selects
    the long-lived continuous deployment: the query keeps polling the
    source and each discovered batch upserts with the same semantics.
    Passing ``available_now=True`` together with a ``processing_time``
    is the only rejected combination (an explicit conflict).

    ``expectations`` (``keyed.expectations.Expectation``) gate every
    micro-batch through ``write_keyed_validated``: drop/quarantine
    rows are diverted per batch (``quarantine_path`` collects tagged
    rejects), and a ``fail``-action violation raises inside the batch
    — deliberately killing the stream, because a poison batch should
    stop ingestion at the gate, not land in the table.  Restart after
    fixing the source; the checkpoint replays the failed batch."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if expectations:
            from cascading_hbase_spark.keyed.expectations import (
                write_keyed_validated,
            )

            write_keyed_validated(
                batch_df, path, key, expectations,
                quarantine_path=quarantine_path, mode=SinkMode.APPEND,
            )
        else:
            write_keyed(batch_df, path, key=key, mode=SinkMode.APPEND)

    writer = (
        events.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
    )
    if available_now and processing_time is not None:
        raise ValueError("pass either available_now or processing_time, not both")
    if available_now is False and processing_time is None:
        # explicit False with no trigger would silently start Spark's
        # default ASAP-polling query, which never terminates — make the
        # continuous mode an explicit choice
        raise ValueError(
            "available_now=False requires processing_time (the continuous "
            "mode's trigger); omit both for drain-and-stop"
        )
    if available_now is None:
        # a requested processingTime trigger implies the continuous
        # mode; otherwise default to the drain-and-stop replay mode
        available_now = processing_time is None
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


_DOCS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def documents_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Bind a documents landing directory (or single parquet file) as a
    file-source stream — the ingest edge of a continuous curation
    pipeline."""
    reader = spark.readStream.schema(_DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(_as_stream_dir(path))


def stream_ingest_dedup(
    docs: DataFrame,
    corpus_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuous ingest-time dedup: every micro-batch drops (a) exact
    text duplicates within the batch and (b) near-duplicates of the
    standing corpus (MinHash-LSH cross join, cost tracking the BATCH
    size), then appends the survivors to the corpus keyed table — the
    streaming form of the `dedup_incremental_vs_corpus` operator, and
    the shape a 100 TB crawl ingests through: corpus state lives in the
    keyed table, not in streaming state stores, so the stream restarts
    cheaply and the corpus is queryable mid-flight."""
    from cascading_hbase_spark.functions.dedup import minhash_neardup_cross
    from cascading_hbase_spark.keyed.table import read_keyed

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        w = Window.partitionBy(text_col).orderBy(id_col)
        batch = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        try:
            corpus = read_keyed(spark, corpus_path)
        except FileNotFoundError:
            corpus = None
        if corpus is not None:
            dup_ids = (
                minhash_neardup_cross(
                    batch, corpus, id_col, text_col, threshold=threshold
                )
                .select(F.col("batch_doc").alias(id_col))
                .distinct()
            )
            batch = batch.join(dup_ids, id_col, "left_anti")
        write_keyed(batch, corpus_path, key=id_col, mode=SinkMode.APPEND)

    writer = (
        docs.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_maintained_view(
    rows: DataFrame,
    base_path: str,
    view_path: str,
    key: str,
    group_col: str,
    sums: dict[str, str],
    checkpoint: str,
    available_now: bool = True,
    mins: dict[str, str] | None = None,
    maxs: dict[str, str] | None = None,
) -> StreamingQuery:
    """Streaming ingest with an incrementally-maintained aggregate:
    each micro-batch (a) LWW-upserts into the keyed base table, then
    (b) applies the base's changefeed delta to the materialized view
    (``keyed/matview.py``).

    This is the streaming shape update-mode window aggregation canNOT
    express: an upsert that changes a row's group must RETRACT its old
    contribution, which the stream engine only knows how to do for its
    own stateful aggregates.  Routing through the keyed changefeed
    makes arbitrary group-by views maintainable under upserts, and the
    view stays crash-consistent (its refresh cursor commits atomically
    with its data), so a re-run micro-batch can never double-apply."""
    from cascading_hbase_spark.keyed.matview import (
        create_aggregate_view,
        refresh_aggregate_view,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        write_keyed(batch_df, base_path, key=key, mode=SinkMode.APPEND, retain=4)
        from cascading_hbase_spark.keyed.table import _exists

        if _exists(view_path):
            refresh_aggregate_view(batch_df.sparkSession, base_path, view_path)
        else:
            create_aggregate_view(
                batch_df.sparkSession, base_path, view_path, group_col, sums,
                mins=mins, maxs=maxs,
            )

    writer = rows.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_maintained_cms(
    docs: DataFrame,
    base_path: str,
    view_path: str,
    checkpoint: str,
    text_col: str = "text",
    n_rows: int = 3,
    width: int = 512,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming-maintained count-min sketch: each micro-batch of
    documents folds its tokens into a PARTIAL sketch (n_rows x width
    cell counts — the mergeable property doing the work), appends the
    partial keyed by (batch, cell), and refreshes a SUM-maintained
    view keyed by cell — so the view IS the corpus-global sketch at
    every commit, queryable mid-flight.

    The streaming twin of ``cms_frequency_contract``: per-batch cost
    tracks the BATCH token count (never the corpus), sketch state
    lives in the keyed table (not stream state stores, so restarts are
    cheap), and a replayed micro-batch LWW-overwrites its own partial
    rows instead of double-counting — the exactly-once accumulation
    contract, tested by ``test_stream_maintained_cms``."""
    from cascading_hbase_spark.functions.hashing import hash64
    from cascading_hbase_spark.keyed.matview import (
        create_aggregate_view,
        refresh_aggregate_view,
    )
    from cascading_hbase_spark.keyed.table import _exists

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        tok = batch_df.filter(F.col(text_col).isNotNull()).select(
            F.explode(F.split(text_col, " ")).alias("t")
        )
        cells = tok.select(
            F.posexplode(
                F.array(
                    *[
                        hash64(F.concat(F.lit(f"{i}#"), F.col("t"))) % width
                        for i in range(n_rows)
                    ]
                )
            ).alias("i", "bucket")
        )
        part = (
            cells.groupBy("i", "bucket")
            .agg(F.count("*").alias("c"))
            .select(
                (
                    F.lit(batch_id) * (n_rows * width)
                    + F.col("i") * width
                    + F.col("bucket")
                ).alias("cell_key"),
                (F.col("i") * width + F.col("bucket")).alias("cell"),
                "c",
            )
        )
        write_keyed(part, base_path, key="cell_key", mode=SinkMode.APPEND, retain=4)
        if _exists(view_path):
            refresh_aggregate_view(batch_df.sparkSession, base_path, view_path)
        else:
            create_aggregate_view(
                batch_df.sparkSession, base_path, view_path, "cell",
                {"c_total": "c"},
            )

    writer = docs.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_changefeed_stream(
    spark: SparkSession,
    path: str,
    from_version: int | None = None,
    include_old: bool = False,
) -> DataFrame:
    """Subscribe to a keyed table's changefeed as a STREAMING DataFrame
    — offsets are manifest commit versions, partitions are the touched
    buckets, every change row is tagged ``_change`` in
    {'insert','update','delete'} (the batch ``changefeed_keyed``'s
    contract).  ``include_old=True`` adds the batch feed's ``_before``
    pre-image struct (null for inserts) — what incremental aggregate
    maintenance needs to retract an update's old contribution.  See
    ``streaming/changefeed_source.py`` for the source's architecture
    and contracts (pinned schema, TTL refusal, horizon signal).

    ``from_version=None`` (default) subscribes to FUTURE changes only
    (cursor = the table's version at stream start, like
    ``create_replica``); pass an older retained version to replay."""
    import json as _json

    from cascading_hbase_spark.keyed.controlplane import get_control_plane
    from cascading_hbase_spark.keyed.table import _load_meta
    from cascading_hbase_spark.streaming.changefeed_source import (
        KeyedChangefeedDataSource,
    )

    # fail fast driver-side (the source re-checks in its own planning
    # worker): TTL filtering is wall-clock-dependent, so replaying an
    # offset interval would not be deterministic
    if _load_meta(path).get("ttl"):
        raise ValueError(
            f"keyed table {path} has a row-TTL policy; a changefeed "
            f"stream over it could not replay deterministically — "
            f"subscribe to a TTL-free table instead"
        )
    # Ship the installed control plane to the planning worker (r12):
    # the worker is a separate process, so it rebuilds an equivalent
    # plane from this serializable spec — the same pattern a cloud
    # connector uses for endpoint/credentials.  A plane whose state is
    # process-local (the in-memory emulated store) cannot be shipped;
    # refuse here rather than let the worker silently read local paths
    # that hold no manifest.
    spec = get_control_plane().plane_spec()
    if spec is None:
        raise RuntimeError(
            "the installed control plane's state is process-local and "
            "cannot be reconstructed in the streaming source's planning "
            "worker; use a shareable plane (local FS, or an object "
            "store with a FileBackedObjectStore/SDK client)"
        )
    spark.dataSource.register(KeyedChangefeedDataSource)
    reader = (
        spark.readStream.format("keyed_changefeed")
        .option("path", path)
        .option("plane", _json.dumps(spec))
    )
    if from_version is not None:
        reader = reader.option("from_version", str(from_version))
    if include_old:
        reader = reader.option("include_old", "true")
    return reader.load()


def _max_checkpoint_offset(checkpoint: str) -> int:
    """Highest micro-batch id the stream checkpoint has PLANNED (its
    ``offsets`` write-ahead log), or -1 for a fresh/absent checkpoint.
    Spark writes ``offsets/<batchId>`` before running the batch and
    ``commits/<batchId>`` after — so at rest or mid-crash the planned
    max is always the applied max or one ahead, which is the invariant
    the CDC maintenance gates below check."""
    d = os.path.join(checkpoint, "offsets")
    try:
        ids = [int(n) for n in os.listdir(d) if n.isdigit()]
    except FileNotFoundError:
        return -1
    return max(ids, default=-1)


def _max_checkpoint_commit(checkpoint: str) -> int:
    """Highest micro-batch id the checkpoint has COMMITTED (its
    ``commits`` log — written AFTER the sink completes), or -1.
    Commits are sequential, so every id at or below the max has
    committed even when its own log entry was purged
    (``minBatchesToRetain``, default 100, trims both logs from the
    oldest end)."""
    d = os.path.join(checkpoint, "commits")
    try:
        ids = [int(n) for n in os.listdir(d) if n.isdigit()]
    except FileNotFoundError:
        return -1
    return max(ids, default=-1)


def _walled_end(checkpoint: str, batch_id: int) -> int | None:
    """The END offset (a keyed-table manifest version) the checkpoint's
    write-ahead log recorded for ``batch_id``, or None when the entry
    is missing/unparseable.  Format: Spark's HDFSMetadataLog — a
    version line, a metadata JSON line, then one offset JSON per
    source (ours is ``{"version": N}``)."""
    import json as _json

    try:
        with open(os.path.join(checkpoint, "offsets", str(batch_id))) as f:
            lines = [ln for ln in f.read().splitlines() if ln.strip()]
        return int(_json.loads(lines[-1])["version"])
    except Exception:
        return None


def stream_replica(
    spark: SparkSession,
    primary_path: str,
    replica_path: str,
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """An ALWAYS-ON follower: subscribe to the primary's changefeed
    stream (``read_changefeed_stream`` — offsets are manifest commit
    versions) and MERGE each micro-batch into a downstream keyed table
    — the streaming twin of ``keyed/replica.sync_replica``, and the
    shape a 100 TB deployment actually runs (continuous convergence
    instead of scheduled diff pulls; per-batch cost is O(touched
    buckets), never O(table)).

    Seeding: a missing follower is seeded from the primary's CURRENT
    snapshot (``create_replica``) and the stream subscribes from that
    snapshot's version, so no change is missed and none is applied
    twice; an existing follower must be a replica of this primary, and
    the stream resumes from the CHECKPOINT's offsets (first run: the
    manifest cursor).

    Exactly-once: offsets live in the stream checkpoint; a replayed
    micro-batch re-merges the same diff rows, and a changefeed MERGE
    is idempotent (upserts re-apply the same post-image, deletes of
    absent keys no-op), so crash-replay converges instead of
    double-applying — and since r12 each applied batch additionally
    stamps ``replica.stream = {checkpoint, batch_id}`` in the SAME
    atomic commit as its merge, so replays are recognized and skipped
    outright, and every stream start can cross-check the checkpoint's
    planned-offset log against the follower's APPLIED state (a
    checkpoint running ahead of the stamp would otherwise silently
    skip the interval between them — LWW replays converge but never
    re-emit a skipped interval).  The follower manifest's
    ``replica.cursor`` stays at the SEED version — the checkpoint is
    the authoritative stream cursor (foreachBatch cannot see its
    offset range, so advancing the manifest cursor would be a guess;
    an interleaved batch ``sync_replica`` from the stale cursor stays
    convergent — diffs re-applied over newer state still produce the
    primary's post-image — but wastes work: pick one maintenance
    mode).

    The primary's version-token registration is mirrored per batch
    (``sync_replica``'s forwarding rule) so cascaded replication off
    the follower classifies on payload too."""
    from cascading_hbase_spark.keyed.replica import (
        StaleReplicaError,
        attach_replica_stream_stamp,
        create_replica,
    )
    from cascading_hbase_spark.keyed.table import (
        _exists,
        _load_meta,
        apply_changefeed,
        changefeed_keyed,
    )

    seeded_now = not _exists(replica_path)
    if seeded_now:
        if _max_checkpoint_offset(checkpoint) >= 0:
            # a checkpoint that already planned batches belongs to some
            # OTHER stream: resuming a just-seeded follower from its
            # offsets (instead of the seed cursor) silently skips every
            # change between them — refuse before minting the follower
            raise ValueError(
                f"checkpoint {checkpoint} already contains planned "
                f"offsets but {replica_path} does not exist yet; a "
                f"freshly seeded follower needs a FRESH checkpoint"
            )
        create_replica(spark, primary_path, replica_path)
    rep = _load_meta(replica_path).get("replica")
    if rep is None or rep.get("of") != primary_path:
        raise ValueError(
            f"{replica_path} exists but is not a replica of "
            f"{primary_path} (create_replica first, or point the "
            f"stream at the follower's real primary {rep and rep.get('of')!r})"
        )
    # Incarnation gate, mirroring sync_replica exactly (review finding:
    # the PATH check alone lets a REPLACEd primary silently diverge the
    # follower — cursor numbers cannot prove lineage across a REPLACE):
    # a stamped follower must name the primary's CURRENT incarnation; a
    # pre-stamp follower is refused whenever the primary carries a
    # table_id at all (rebuild is one-time, via the backfill).
    expected_id = rep.get("of_id")
    pmeta0 = _load_meta(primary_path)
    if expected_id is None:
        if pmeta0.get("table_id") is not None:
            raise StaleReplicaError(
                f"replica {replica_path} predates incarnation stamping; "
                f"the cursor alone cannot prove the primary was not "
                f"replaced — rebuild with create_replica"
            )
    elif expected_id != pmeta0.get("table_id"):
        raise StaleReplicaError(
            f"primary {primary_path} was replaced since the follower "
            f"was seeded; rebuild with create_replica"
        )
    # Applied-offset cross-check (r11 ADVICE): the sink stamps
    # (checkpoint, batch_id) into the replica manifest in the SAME
    # atomic commit as each merge, so at stream start the checkpoint's
    # planned-offset log can be checked against what the follower
    # actually APPLIED.  A checkpoint running AHEAD of the applied
    # stamp by more than the one in-flight batch means batches were
    # planned that this follower never merged — resuming would skip
    # the interval between them, and an LWW merge replays converge but
    # NEVER re-emit a skipped interval: the divergence would be
    # permanent and undetected.  Proof order mirrors stream_matview:
    # the checkpoint's own commits log first (stamp proves ownership;
    # committed-but-unstamped => the sink's isEmpty path => empty for
    # this follower), then the primary's history (interval diff empty
    # => nothing to skip), else refuse.
    st = rep.get("stream")
    if st is not None and st.get("checkpoint") != checkpoint:
        raise StaleReplicaError(
            f"replica {replica_path} is stream-maintained under "
            f"checkpoint {st.get('checkpoint')!r}; rebuild with "
            f"create_replica to move it to a new checkpoint"
        )
    stamp = st["batch_id"] if st is not None else -1
    max_planned = _max_checkpoint_offset(checkpoint)
    if st is not None and max_planned < stamp:
        raise StaleReplicaError(
            f"checkpoint {checkpoint} has no offsets entry for the "
            f"follower's last applied batch {stamp} (checkpoint reset "
            f"or deleted?); rebuild with create_replica and a fresh "
            f"checkpoint"
        )
    if (st is None and max_planned >= 0) or max_planned > stamp + 1:
        if st is None or _max_checkpoint_commit(checkpoint) < max_planned - 1:
            v_a = (
                _walled_end(checkpoint, stamp)
                if stamp >= 0
                else rep["cursor"]
            )
            v_b = _walled_end(checkpoint, max_planned)
            skipped = True
            if v_a is not None and v_b is not None and v_b >= v_a:
                try:
                    skipped = (
                        v_b > v_a
                        and not changefeed_keyed(
                            spark, primary_path, v_a, to_generation=v_b
                        ).isEmpty()
                    )
                except FileNotFoundError:
                    skipped = True  # interval fell below the horizon
            if skipped:
                raise StaleReplicaError(
                    f"checkpoint {checkpoint} planned through batch "
                    f"{max_planned} but follower {replica_path} last "
                    f"applied batch {stamp}, and the un-applied offset "
                    f"interval cannot be proven empty; resuming would "
                    f"silently skip it — rebuild with create_replica "
                    f"and a fresh checkpoint"
                )
    # mode stamp from attach time (not first batch): a foreign
    # checkpoint can never adopt this follower unchecked again
    attach_replica_stream_stamp(replica_path, checkpoint)
    feed = read_changefeed_stream(
        spark, primary_path, from_version=rep["cursor"]
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        pmeta = _load_meta(primary_path)
        if (
            expected_id is not None
            and pmeta.get("table_id") != expected_id
        ):
            # REPLACE landed MID-STREAM: refuse the merge — the batch
            # was planned against one incarnation's history and must
            # not land on a follower seeded from another
            raise StaleReplicaError(
                f"primary {primary_path} was replaced while the "
                f"follower stream was running; rebuild with "
                f"create_replica and a fresh checkpoint"
            )
        rmeta = _load_meta(replica_path)
        rep_now = rmeta["replica"]
        st_now = rep_now.get("stream")
        if st_now is not None and batch_id <= st_now.get("batch_id", -1):
            # crash-replayed batch already atomically applied+stamped:
            # re-merging would converge (LWW is idempotent) but wastes
            # a full merge commit — skip, like apply_sum_delta does
            return
        # sync_replica's seq-forwarding rule: mirror the primary's
        # registration, clear a deregistered one, else leave untouched
        pseq = pmeta.get("seq_col")
        if pseq and pseq in batch_df.columns:
            fwd_seq = pseq
        elif not pseq and rmeta.get("seq_col"):
            fwd_seq = ""
        else:
            fwd_seq = None
        apply_changefeed(
            batch_df.sparkSession, replica_path, batch_df, seq_col=fwd_seq,
            # applied-batch stamp, in the SAME atomic commit as the
            # merge — what the stream-start cross-check reads
            meta_extra={"replica": {
                **rep_now,
                "stream": {"checkpoint": checkpoint, "batch_id": batch_id},
            }},
        )

    writer = feed.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_matview(
    spark: SparkSession,
    base_path: str,
    view_path: str,
    checkpoint: str,
    group_col: str | None = None,
    sums: dict[str, str] | None = None,
    n_buckets: int | None = None,
    available_now: bool = True,
    mins: dict[str, str] | None = None,
    maxs: dict[str, str] | None = None,
) -> StreamingQuery:
    """An ALWAYS-ON incrementally-maintained aggregate view: subscribe
    to the base table's changefeed stream WITH pre-images
    (``read_changefeed_stream(include_old=True)``) and fold each
    micro-batch's per-group COUNT/SUM/MIN/MAX delta into the view —
    the streaming twin of ``refresh_aggregate_view``, completing the
    CDC quadrant square (batch/stream x replica/view).  Per-batch cost
    is O(touched buckets) for the diff + O(changed groups) for the
    merge, never O(table) — the shape continuous rollup maintenance
    runs at 100 TB.

    Seeding: a missing view is built from the base's CURRENT snapshot
    (``create_aggregate_view`` — ``group_col``/``sums``/``mins``/
    ``maxs`` required) and the stream subscribes from that snapshot's
    version; an existing view of this base is adopted and streamed
    from its refresh cursor.

    MIN/MAX (r12): an extremum-removing retraction triggers a
    re-aggregate of THAT group pinned to the batch's END snapshot.
    ``foreachBatch`` cannot see its offset range, but the checkpoint's
    write-ahead log records each batch's end offset (a base manifest
    version) — the sink recovers it via ``_walled_end`` and pins the
    rescan there, so rows from commits AFTER the batch can never leak
    into its extrema.  An unparseable WAL entry refuses loudly
    (StaleViewError) rather than rescanning the wrong snapshot; the
    WAL format itself is pinned by a regression test against the
    running Spark.

    Exactly-once: SUM deltas are NOT idempotent, so replay safety
    cannot ride on the merge like ``stream_replica``'s LWW does.
    Instead ``keyed/matview.apply_sum_delta`` stamps (checkpoint,
    batch_id) into the view manifest in the SAME atomic commit as the
    data: a crash-replayed batch (same id, same offset range, same
    rows — generations are immutable) is recognized and skipped, and
    a FOREIGN checkpoint is refused outright.  Once a batch lands,
    scheduled ``refresh_aggregate_view`` on this view is refused too
    (its manifest cursor is stale by design; the checkpoint is the
    authority) — pick one maintenance mode, enforced.

    The incarnation gate mirrors ``stream_replica``: a REPLACEd base
    is refused at stream start AND before every merge (a mid-stream
    REPLACE must not fold one incarnation's diff into a view seeded
    from another)."""
    from cascading_hbase_spark.keyed.matview import (
        StaleViewError,
        apply_sum_delta,
        attach_stream_stamp,
        create_aggregate_view,
        _reject_token_aggregation,
    )
    from cascading_hbase_spark.keyed.table import _exists, _load_meta

    seeded_now = not _exists(view_path)
    if seeded_now:
        if group_col is None:
            raise ValueError(
                f"{view_path} does not exist; pass group_col (and "
                f"sums, unless count-only) to seed it "
                f"(create_aggregate_view)"
            )
        if _max_checkpoint_offset(checkpoint) >= 0:
            raise ValueError(
                f"checkpoint {checkpoint} already contains planned "
                f"offsets but {view_path} does not exist yet; a freshly "
                f"seeded view needs a FRESH checkpoint (resuming from a "
                f"foreign checkpoint's offsets instead of the seed "
                f"cursor would skip or double-apply deltas)"
            )
        create_aggregate_view(
            spark, base_path, view_path, group_col,
            sums=sums, n_buckets=n_buckets, mins=mins, maxs=maxs,
        )
    mv = _load_meta(view_path).get("matview")
    if mv is None or mv.get("base") != base_path:
        raise ValueError(
            f"{view_path} exists but is not an aggregate view of "
            f"{base_path} (it views {mv and mv.get('base')!r})"
        )
    has_exts = bool(mv.get("mins") or mv.get("maxs"))
    st = mv.get("stream")
    if st is not None and st.get("checkpoint") != checkpoint:
        raise StaleViewError(
            f"view {view_path} is maintained under checkpoint "
            f"{st.get('checkpoint')!r}; rebuild with "
            f"create_aggregate_view to move it to a new checkpoint"
        )
    # Cross-check the checkpoint's planned-offset log against the
    # view's applied stamp.  Spark plans offsets/<N> BEFORE the sink
    # runs and commits/<N> after, so under correct operation (including
    # every crash window) max_planned is the stamp or stamp+1.  Behind
    # that: the checkpoint was RESET — batch numbering restarts at 0,
    # every replayed id <= stamp would be skipped by the exactly-once
    # stamp while covering DIFFERENT offset ranges: silent delta loss.
    # Ahead: the checkpoint planned batches this view never applied
    # (it belongs to some other maintenance run): silent gap.  Both
    # are unrecoverable without a rebuild — refuse loudly.
    max_planned = _max_checkpoint_offset(checkpoint)
    stamp = st["batch_id"] if st is not None else -1
    if st is not None and max_planned < stamp:
        raise StaleViewError(
            f"checkpoint {checkpoint} has no offsets entry for the "
            f"view's last applied batch {stamp} (checkpoint reset or "
            f"deleted?); replayed batch ids would alias already-applied "
            f"stamps over different offset ranges — rebuild with "
            f"create_aggregate_view and a fresh checkpoint"
        )
    if max_planned > stamp + 1:
        # Planned ran ahead of applied by more than the one in-flight
        # batch.  LEGITIMATE cause: empty micro-batches — the sink's
        # isEmpty early-return never stamps, so version-bump-only base
        # commits (absent-key deletes, compactions, vacuum) advance the
        # planned log arbitrarily far past the stamp (r11 explore-fuzz
        # falsifier).  ILLEGITIMATE cause: a checkpoint from a
        # different maintenance run, whose planned batches carried
        # real deltas this view never applied.
        #
        # FIRST proof (r11 ADVICE): the checkpoint's own commits log.
        # The stamp proves THIS view's sink owned this checkpoint, and
        # the sink's only no-stamp completion path is the isEmpty
        # early-return — so every batch the checkpoint COMMITTED past
        # the stamp was provably empty for this view (a sink that
        # raised never commits; a sink that applied would have advanced
        # the stamp).  Commits are sequential, so committed >=
        # max_planned - 1 proves every planned batch except the one
        # legitimate in-flight tail (which Spark replays under the same
        # id) was empty — no diff needed, no dependence on offset
        # entries or base generations that retention may have pruned
        # (the > minBatchesToRetain quiet-period and the retain-horizon
        # crash of the r11 ADVICE both land here).
        # (the commits proof needs the stamp: with st None the
        # checkpoint was never provably this view's, so committed
        # batches could be another query's non-empty work — only the
        # base-history diff below can clear it)
        if st is None or _max_checkpoint_commit(checkpoint) < max_planned - 1:
            # SECOND proof: the base's own history — diff the
            # never-stamped interval (stamped batch's WAL'd end ->
            # newest planned end); empty means nothing was skipped.
            from cascading_hbase_spark.keyed.table import changefeed_keyed

            v_a = (
                _walled_end(checkpoint, stamp)
                if stamp >= 0
                else mv["base_version"]
            )
            v_b = _walled_end(checkpoint, max_planned)
            skipped_real_deltas = True
            if v_a is not None and v_b is not None and v_b >= v_a:
                try:
                    skipped_real_deltas = (
                        v_b > v_a
                        and not changefeed_keyed(
                            spark, base_path, v_a, to_generation=v_b
                        ).isEmpty()
                    )
                except FileNotFoundError:
                    # v_a fell below the base's retain/vacuum horizon
                    # (r11 ADVICE: two version-bump commits drained as
                    # empty batches suffice at DEFAULT_RETAIN=2) — the
                    # interval can no longer be proven empty.  Refuse
                    # with the documented rebuild signal (mirroring
                    # refresh_aggregate_view's wrap) instead of leaking
                    # a raw I/O error.
                    skipped_real_deltas = True
            if skipped_real_deltas:
                raise StaleViewError(
                    f"checkpoint {checkpoint} planned through batch "
                    f"{max_planned} but view {view_path} last applied "
                    f"{stamp}, and the un-applied offset interval "
                    f"cannot be proven empty (uncommitted batches, or "
                    f"the interval is no longer retained/diffable on "
                    f"the base); the checkpoint may belong to a "
                    f"different maintenance run — rebuild with "
                    f"create_aggregate_view and a fresh checkpoint"
                )
    if st is None and max_planned >= 0:
        # Planned-but-never-applied batches against an unstamped view:
        # legitimate iff planned AGAINST THIS VIEW's seed cursor —
        # replay/resume then covers (cursor, walled_end] onward,
        # exactly the delta the view needs.  A foreign checkpoint
        # whose WAL'd end predates the cursor would instead replay a
        # range the seed already contains (silent double-apply) —
        # parse the oldest planned entry's WAL and refuse it.
        walled_end = _walled_end(checkpoint, 0)
        if walled_end is None or walled_end < mv["base_version"]:
            # walled_end None also covers an offsets/0 entry purged by
            # Spark's minBatchesToRetain (default 100) — possible only
            # after >100 batches against a NEVER-stamped view, where
            # nothing can prove the purged lineage started at this
            # view's seed; the refusal direction is safe (rebuild),
            # and a stamped view never enters this branch (the
            # commits-log proof above covers its quiet periods).
            raise StaleViewError(
                f"checkpoint {checkpoint} planned a first batch ending "
                f"at offset {walled_end!r}, behind (or unreadable "
                f"against) the view's seed cursor {mv['base_version']} "
                f"— either it belongs to a different maintenance run, "
                f"or its offsets/0 entry aged out of Spark's "
                f"minBatchesToRetain window before this view ever "
                f"applied a batch; use a fresh checkpoint"
            )
    # incarnation gate, mirroring stream_replica (cursor numbers cannot
    # prove lineage across a REPLACE)
    expected_id = mv.get("base_id")
    bmeta0 = _load_meta(base_path)
    if expected_id is None:
        if bmeta0.get("table_id") is not None:
            raise StaleViewError(
                f"view {view_path} predates incarnation stamping; the "
                f"cursor alone cannot prove the base was not replaced "
                f"— rebuild with create_aggregate_view"
            )
    elif expected_id != bmeta0.get("table_id"):
        raise StaleViewError(
            f"base table {base_path} was replaced since the view was "
            f"built; rebuild with create_aggregate_view"
        )
    _reject_token_aggregation(
        bmeta0.get("seq_col"), mv["group"], mv["sums"],
        mv.get("mins") or {}, mv.get("maxs") or {}, view_path,
    )
    # Attach-time mode stamp (r11 ADVICE): refuse scheduled refreshes
    # from the moment the stream is attached, not only after its first
    # non-empty batch lands — the gap is exactly the window where a
    # racing refresh would advance the cursor and the first stream
    # batch then folds the same interval again (SUM double-apply).
    # Runs AFTER every gate above so a refused stream never stamps.
    attach_stream_stamp(view_path, checkpoint)
    feed = read_changefeed_stream(
        spark, base_path, from_version=mv["base_version"], include_old=True
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        bmeta = _load_meta(base_path)
        if (
            expected_id is not None
            and bmeta.get("table_id") != expected_id
        ):
            raise StaleViewError(
                f"base table {base_path} was replaced while the view "
                f"stream was running; rebuild with "
                f"create_aggregate_view and a fresh checkpoint"
            )
        # the registration can land AFTER the stream started; a token
        # the view aggregates makes incremental maintenance silently
        # lossy (token-only rewrites produce an empty diff) — re-check
        # against the CURRENT registration, like every refresh does
        _reject_token_aggregation(
            bmeta.get("seq_col"), mv["group"], mv["sums"],
            mv.get("mins") or {}, mv.get("maxs") or {}, view_path,
        )
        end_version = None
        if has_exts:
            # the batch's END offset (a base manifest version), from
            # the checkpoint WAL Spark wrote BEFORE running this sink
            # — the snapshot the extremum rescan must pin to
            end_version = _walled_end(checkpoint, batch_id)
            if end_version is None:
                raise StaleViewError(
                    f"checkpoint {checkpoint} has no parseable offsets "
                    f"entry for in-flight batch {batch_id}; the "
                    f"extremum rescan cannot be pinned to the batch's "
                    f"end snapshot — refusing to fold (a WAL format "
                    f"change? see test_checkpoint_wal_format_pin)"
                )
        apply_sum_delta(
            batch_df.sparkSession, view_path, batch_df, checkpoint,
            batch_id, end_version=end_version,
        )

    writer = feed.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_index(
    spark: SparkSession,
    path: str,
    col: str,
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """An ALWAYS-ON secondary-index maintainer: subscribe to the main
    table's changefeed stream WITH pre-images and MERGE each
    micro-batch's index delta (upsert ``<new value>\\x00<key>``,
    retract ``<old value>\\x00<key>`` — ``keyed/index._index_delta``,
    the same delta scheduled ``refresh_index`` applies) — the THIRD
    streaming CDC consumer, completing the square's index column
    (batch/stream x replica/view/index).  Per-batch cost is O(touched
    buckets) for the diff + O(value-moved rows) for the merge;
    index-silent updates cost nothing.

    Freshness: the ``index_of.version`` stamp advances to each batch's
    END offset — a base manifest version recovered from the checkpoint
    WAL (``_walled_end``), so ``index_lookup``'s freshness check and
    its point-in-time snapshot pinning stay EXACT.  Batches that carry
    no change rows still advance the stamp (a meta-only commit):
    version-bump-only main commits must not leave an always-on index
    reporting stale.

    Exactly-once rides merge idempotence (like ``stream_replica``:
    re-applying the same index delta converges) plus the applied-batch
    stamp written in the SAME atomic commit as each merge; replays
    skip, a foreign checkpoint running ahead of the applied stamp is
    refused at stream start, scheduled ``refresh_index`` commits are
    refused from ATTACH time (the ``write_keyed`` stream-stamp clobber
    guard), and a REPLACEd main table is refused at start and before
    every merge.  Rebuild (``create_index``) hands maintenance back to
    batch: REPLACE mints a fresh manifest, and the next ``stream_index``
    needs a fresh checkpoint."""
    from cascading_hbase_spark.keyed.index import (
        StaleIndexError,
        _index_delta,
        _index_meta_commit,
        _index_path,
        attach_index_stream_stamp,
        create_index,
    )
    from cascading_hbase_spark.keyed.table import (
        _exists,
        _load_meta,
        apply_changefeed,
        changefeed_keyed,
    )

    from cascading_hbase_spark.keyed.index import _ENC, _norm_col

    ipath = _index_path(path, col)
    if not _exists(ipath):
        if _max_checkpoint_offset(checkpoint) >= 0:
            raise ValueError(
                f"checkpoint {checkpoint} already contains planned "
                f"offsets but the index on {col!r} does not exist yet; "
                f"a freshly built index needs a FRESH checkpoint"
            )
        create_index(spark, path, col)
    info = _load_meta(ipath).get("index_of", {})
    if info.get("path") != path or info.get("col") != _norm_col(col):
        raise ValueError(
            f"{ipath} is not the index of ({path}, {col!r})"
        )
    if info.get("enc") != _ENC:
        raise StaleIndexError(
            f"index on {col!r} was built with key-encoding "
            f"v{info.get('enc', 1)} but this engine maintains v{_ENC}; "
            f"rebuild with create_index and a fresh checkpoint"
        )
    include = info.get("include") or []
    expected_id = info.get("table_id")
    pmeta0 = _load_meta(path)
    if expected_id is None or expected_id != pmeta0.get("table_id"):
        raise StaleIndexError(
            f"index on {col!r} was built against a previous incarnation "
            f"of {path} (or predates incarnation stamping); rebuild "
            f"with create_index and a fresh checkpoint"
        )
    # applied-offset cross-check, mirroring stream_replica: the sink
    # stamps (checkpoint, batch_id) atomically with each merge, so a
    # checkpoint running AHEAD of the applied stamp is provable —
    # resuming it would silently skip the interval
    st = info.get("stream")
    if st is not None and st.get("checkpoint") != checkpoint:
        raise StaleIndexError(
            f"index on {col!r} is stream-maintained under checkpoint "
            f"{st.get('checkpoint')!r}; rebuild with create_index to "
            f"move it to a new checkpoint"
        )
    stamp = st["batch_id"] if st is not None else -1
    max_planned = _max_checkpoint_offset(checkpoint)
    if st is not None and max_planned < stamp:
        raise StaleIndexError(
            f"checkpoint {checkpoint} has no offsets entry for the "
            f"index's last applied batch {stamp} (checkpoint reset or "
            f"deleted?); rebuild with create_index and a fresh "
            f"checkpoint"
        )
    if (st is None and max_planned >= 0) or max_planned > stamp + 1:
        if st is None or _max_checkpoint_commit(checkpoint) < max_planned - 1:
            v_a = (
                _walled_end(checkpoint, stamp)
                if stamp >= 0
                else info.get("version")
            )
            v_b = _walled_end(checkpoint, max_planned)
            skipped = True
            if v_a is not None and v_b is not None and v_b >= v_a:
                try:
                    skipped = (
                        v_b > v_a
                        and not changefeed_keyed(
                            spark, path, v_a, to_generation=v_b
                        ).isEmpty()
                    )
                except FileNotFoundError:
                    skipped = True  # interval fell below the horizon
            if skipped:
                raise StaleIndexError(
                    f"checkpoint {checkpoint} planned through batch "
                    f"{max_planned} but the index on {col!r} last "
                    f"applied batch {stamp}, and the un-applied offset "
                    f"interval cannot be proven empty; resuming would "
                    f"silently skip it — rebuild with create_index and "
                    f"a fresh checkpoint"
                )
    attach_index_stream_stamp(path, col, checkpoint)
    feed = read_changefeed_stream(
        spark, path, from_version=info["version"], include_old=True
    )
    key = pmeta0["key"]

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        pmeta = _load_meta(path)
        if pmeta.get("table_id") != expected_id:
            raise StaleIndexError(
                f"main table {path} was replaced while the index "
                f"stream was running; rebuild with create_index and a "
                f"fresh checkpoint"
            )
        cur = _load_meta(ipath).get("index_of", {})
        st_now = cur.get("stream")
        if st_now is not None and batch_id <= st_now.get("batch_id", -1):
            return  # replayed batch: already atomically applied
        end_v = _walled_end(checkpoint, batch_id)
        if end_v is None:
            raise StaleIndexError(
                f"checkpoint {checkpoint} has no parseable offsets "
                f"entry for in-flight batch {batch_id}; the index "
                f"freshness stamp cannot be pinned to the batch's end "
                f"offset — refusing to merge (a WAL format change? "
                f"see test_checkpoint_wal_format_pin)"
            )
        stamped = {
            "path": path, "col": _norm_col(col), "version": end_v,
            "table_id": expected_id, "enc": _ENC, "include": include,
            "stream": {"checkpoint": checkpoint, "batch_id": batch_id},
        }
        if batch_df.isEmpty():
            # no change rows, but the stamp must still advance: a
            # version-bump-only main commit (compaction, vacuum,
            # absent-key delete) must not leave an always-on index
            # reporting stale to index_lookup
            def mutate(i: dict) -> None:
                i.update(stamped)

            _index_meta_commit(ipath, mutate)
            return
        apply_changefeed(
            batch_df.sparkSession, ipath,
            _index_delta(batch_df, key, col, include=include),
            meta_extra={"index_of": stamped},
        )

    writer = feed.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
