"""§2.10 Structured Streaming query pairs: each registered entry
executes a real streaming query (file source → watermark → stateful op
→ memory sink, ``Trigger.AvailableNow``) and returns the materialized
result, so the driver's oracle check exercises the streaming engine
itself — not a batch stand-in.

The windowed entries share their oracle SQL with the batch forms in
``queries/events.py`` (same semantics, streaming execution).  Every
entry is fully oracled: the dedup entry keys on the unique event id
(deterministic survivor content), and the stateful entries accumulate
integer cents and reduce to final-per-key state (deterministic,
bit-equal to the batch DECIMAL sums)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cascading_hbase_spark import streaming as S
from cascading_hbase_spark.queries import query

_TUMBLING_ORACLE = """
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
    SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM ev
    GROUP BY 1, 2
"""

_SESSION_ORACLE = """
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
    marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          > INTERVAL '10 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM ev
    ), islands AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM marked
    )
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS last_event,
           CAST(count(*) AS BIGINT) AS n_events
    FROM islands GROUP BY user_id, sid
"""


@query("streaming_tumbling_window_agg", oracle=_TUMBLING_ORACLE)
def streaming_tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling windows executed by the streaming engine (watermarked
    stateful aggregation), checked against the batch SQL oracle."""
    return S.run_available_now(
        S.tumbling_counts(S.events_stream(spark, sf_dir)), "complete"
    )


@query("streaming_session_window_agg", oracle=_SESSION_ORACLE)
def streaming_session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-merged session windows on the streaming path."""
    return S.run_available_now(
        S.session_counts(S.events_stream(spark, sf_dir)), "complete"
    )


_SLIDING_ORACLE = """
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
    SELECT time_bucket(INTERVAL '30 minutes', ts) - g * INTERVAL '30 minutes' AS w_start,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM ev CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS g)
    GROUP BY 1
"""


@query("streaming_sliding_window_agg", oracle=_SLIDING_ORACLE)
def streaming_sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1h length, 30min slide) on the streaming path."""
    return S.run_available_now(
        S.sliding_counts(S.events_stream(spark, sf_dir)), "complete"
    )


_INTERVAL_JOIN_ORACLE = """
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
    c AS (SELECT user_id, ts AS click_ts, event_id AS click_id
          FROM ev WHERE event_type = 'click'),
    p AS (SELECT user_id, ts AS purchase_ts, event_id AS purchase_id
          FROM ev WHERE event_type = 'purchase')
    SELECT p.user_id, purchase_id, click_id, purchase_ts, click_ts
    FROM p JOIN c ON p.user_id = c.user_id
                 AND c.click_ts <= p.purchase_ts
                 AND c.click_ts >= p.purchase_ts - INTERVAL '1 hour'
"""


@query("streaming_interval_join", oracle=_INTERVAL_JOIN_ORACLE)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (purchase <- same-user clicks within
    the preceding hour), executed by the streaming engine with
    watermark-bounded join state on both sides; inner join makes the
    emitted row set deterministic, so the batch SQL is a full oracle."""
    ev = S.events_stream(spark, sf_dir)
    import pyspark.sql.functions as F

    return S.run_available_now(
        S.interval_join_clicks_to_purchases(
            ev.filter(F.col("event_type") == "click"),
            S.events_stream(spark, sf_dir).filter(F.col("event_type") == "purchase"),
        ),
        "append",
    )


_EXACTLY_ONCE_ORACLE = """
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
           value, props
    FROM events
"""


@query("streaming_dedup_within_watermark", oracle=_EXACTLY_ONCE_ORACLE)
def streaming_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once replay dedup on the streaming path: the events
    stream unioned with a full redelivered copy of itself (at-least-
    once delivery), deduped on the unique ``event_id`` within the
    watermark.  Every event must emit exactly once with its full
    payload — redeliveries are byte-identical, so the surviving row
    content is deterministic and the batch table is a FULL oracle (the
    r02 rows-only form keyed on (user_id, event_type), whose survivor
    is arrival-order-dependent, lives on as
    ``streaming_dedup_contract``'s key-set check)."""
    return S.run_available_now(
        S.exactly_once_ingest(
            S.events_stream(spark, sf_dir), S.events_stream(spark, sf_dir)
        ),
        "append",
    )


_RUNNING_TOTALS_ORACLE = """
    SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM events GROUP BY 1, 2
"""


@query("streaming_user_running_totals", oracle=_RUNNING_TOTALS_ORACLE)
def streaming_user_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-key (user_id, event_type) running totals via
    ``applyInPandasWithState``, reduced to the final state per key.
    The update-mode sink keeps every intermediate emission and
    ``n_events`` is strictly monotone per key, so ``max_by(n_events)``
    IS the final state; state accumulates integer cents, so the final
    totals equal the batch DECIMAL sums bit-for-bit — full oracle
    (this replaces the r02 rows-only form, whose raw update stream's
    emission COUNT is batch-schedule-dependent; the single-key final
    form is ``streaming_stateful_totals_final``)."""
    raw = S.run_available_now(
        S.running_totals_by(S.events_stream(spark, sf_dir), ("user_id", "event_type")),
        "update",
    )
    return raw.groupBy("user_id", "event_type").agg(
        F.max("n_events").cast("bigint").alias("n_events"),
        F.max_by("value_sum", "n_events").alias("value_sum"),
    )


_STATIC_ENRICH_ORACLE = """
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
    SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start, c_mktsegment,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM ev JOIN customer ON ev.user_id = customer.c_custkey
    GROUP BY 1, 2
"""


@query("streaming_static_enrich", oracle=_STATIC_ENRICH_ORACLE)
def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast join (event stream enriched with the
    customer dimension) feeding a watermarked tumbling rollup per
    market segment, checked against the batch join oracle."""
    from cascading_hbase_spark.catalog import load_table

    customer = load_table(spark, sf_dir, "customer")
    return S.run_available_now(
        S.enriched_segment_revenue(S.events_stream(spark, sf_dir), customer),
        "complete",
    )


@query(
    "streaming_dedup_contract",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def streaming_dedup_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The checkable contract of watermarked streaming dedup: WHICH
    survivor row wins is arrival-order-dependent (hence the raw op
    stays rows-only), but the emitted KEY SET is exactly the distinct
    keys of the input — every key emits at least once, nothing else
    ever emits.  Project the stream output to its key set and that IS
    deterministic."""
    out = S.run_available_now(
        S.dedup_within_watermark(S.events_stream(spark, sf_dir)), "append"
    )
    return out.select("user_id", "event_type").distinct()


@query(
    "streaming_stateful_totals_final",
    oracle="""
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM events GROUP BY 1
    """,
)
def streaming_stateful_totals_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final per-user state of the applyInPandasWithState running
    totals: the update-mode sink keeps every intermediate emission, so
    the final row per user is the one with the highest n_events.  With
    exact integer-cents state the final totals equal the batch DECIMAL
    sums bit-for-bit — full oracle, no float-tolerance hedge."""
    raw = S.run_available_now(
        S.running_user_totals(S.events_stream(spark, sf_dir)), "update"
    )
    return raw.groupBy("user_id").agg(
        F.max("n_events").cast("bigint").alias("n_events"),
        F.max_by("value_sum", "n_events").alias("value_sum"),
    )


_CHANGEFEED_SOURCE_ORACLE = """
    SELECT o_orderkey, o_custkey, price, change FROM (
      SELECT o_orderkey, o_custkey, o_totalprice AS price,
             'delete' AS change
      FROM orders WHERE o_orderkey % 10 < 8 AND o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey, o_custkey, o_totalprice * 2, 'update'
      FROM orders
      WHERE o_orderkey % 10 < 8 AND o_orderkey % 5 = 0
        AND o_orderkey % 7 <> 0
      UNION ALL
      SELECT o_orderkey, o_custkey, o_totalprice, 'insert'
      FROM orders WHERE o_orderkey % 10 >= 8 AND o_orderkey % 7 <> 0
    )
"""


@query("streaming_changefeed_source", oracle=_CHANGEFEED_SOURCE_ORACLE)
def streaming_changefeed_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The changefeed STREAMING SOURCE (r10): a keyed table commits
    three generations — seed, update+insert, delete — and a Structured
    Streaming subscriber (``read_changefeed_stream``, a PySpark 4
    Python DataSource whose offsets are manifest commit versions,
    ``streaming/changefeed_source.py``) drains the net (v1, v3] feed.
    The oracle reconstructs that diff from first principles: deletes
    carry the PRE-change (v1) payload, updates the doubled price,
    inserts the v2-arrived rows; a key inserted at v2 and deleted at
    v3 never appears (absent from both end snapshots)."""
    import os
    import tempfile

    from cascading_hbase_spark.catalog import load_table
    from cascading_hbase_spark.keyed.table import (
        SinkMode, delete_keyed, write_keyed,
    )

    path = os.path.join(tempfile.mkdtemp(prefix="chs_cfs_"), "t")
    k = F.col("o_orderkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.col("o_totalprice").alias("price")
    )
    seed = orders.filter(k % 10 < 8)
    write_keyed(seed, path, "o_orderkey", retain=10)                   # v1
    updates = seed.filter(k % 5 == 0).withColumn(
        "price", F.col("price") * 2
    )
    inserts = orders.filter(k % 10 >= 8)
    write_keyed(
        updates.unionByName(inserts), path, "o_orderkey",
        mode=SinkMode.APPEND,
    )                                                                  # v2
    delete_keyed(spark, path, orders.filter(k % 7 == 0).select("o_orderkey"))  # v3
    feed = S.run_available_now(
        S.read_changefeed_stream(spark, path, from_version=1), "append"
    )
    return feed.withColumnRenamed("_change", "change")


_STREAM_REPLICA_ORACLE = """
    SELECT o_orderkey, o_custkey, price FROM (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
                  ELSE o_totalprice END AS price
      FROM orders WHERE o_orderkey % 10 < 8
      UNION ALL
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders WHERE o_orderkey % 10 >= 8
    ) WHERE o_orderkey % 7 <> 0
"""


@query("streaming_replica_follower", oracle=_STREAM_REPLICA_ORACLE)
def streaming_replica_follower(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING REPLICA (r11, ``streaming/ops.stream_replica``): an
    always-on follower driven by the changefeed streaming source —
    seed a primary (v1), seed the follower off it and drain a
    zero-change availableNow run, then commit updates+inserts (v2)
    and deletes (v3) on the primary and drain a SECOND run from the
    SAME checkpoint.  The second run resumes from the checkpoint's
    offsets (not the follower's seed cursor), merges the (v1, v3] net
    diff via foreachBatch ``apply_changefeed``, and the follower must
    equal the primary's final snapshot exactly — updated prices
    doubled, inserts present, deleted keys gone.  The oracle rebuilds
    that snapshot from first principles over ``orders``."""
    import os
    import tempfile

    from cascading_hbase_spark.catalog import load_table
    from cascading_hbase_spark.keyed.table import (
        SinkMode, delete_keyed, read_keyed, write_keyed,
    )

    root = tempfile.mkdtemp(prefix="chs_srep_")
    primary = os.path.join(root, "primary")
    follower = os.path.join(root, "follower")
    ckpt = os.path.join(root, "ckpt")
    k = F.col("o_orderkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.col("o_totalprice").alias("price")
    )
    seed = orders.filter(k % 10 < 8)
    write_keyed(seed, primary, "o_orderkey", retain=10)                # v1
    # first run: seeds the follower at v1, drains zero changes, and
    # writes the checkpoint the second run must resume from
    S.stream_replica(spark, primary, follower, ckpt).awaitTermination()
    updates = seed.filter(k % 5 == 0).withColumn("price", F.col("price") * 2)
    write_keyed(
        updates.unionByName(orders.filter(k % 10 >= 8)),
        primary, "o_orderkey", mode=SinkMode.APPEND,
    )                                                                  # v2
    delete_keyed(spark, primary, orders.filter(k % 7 == 0).select("o_orderkey"))  # v3
    S.stream_replica(spark, primary, follower, ckpt).awaitTermination()
    return read_keyed(spark, follower).select(
        "o_orderkey", "o_custkey", "price"
    )


_STREAM_MATVIEW_ORACLE = """
    SELECT o_custkey % 100 AS grp,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN o_orderkey % 10 < 8 AND o_orderkey % 5 = 0
                    THEN CAST(round(o_totalprice * 100) AS BIGINT) * 2
                    ELSE CAST(round(o_totalprice * 100) AS BIGINT) END)
                AS BIGINT) AS cents_total
    FROM orders
    WHERE o_orderkey % 7 <> 0
    GROUP BY 1
"""


@query("streaming_matview_sums", oracle=_STREAM_MATVIEW_ORACLE)
def streaming_matview_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING MATVIEW (r11, ``streaming/ops.stream_matview``): an
    always-on COUNT/SUM aggregate view maintained from the changefeed
    stream WITH pre-images (``include_old`` on the r10 source) — the
    CDC square's last cell (batch/stream x replica/view).  Seed a
    primary at v1 and the view off its snapshot, drain a zero-change
    run; then commit doubled-cents updates + inserts (v2) and deletes
    (v3) and drain a second run from the SAME checkpoint: the per-group
    delta (retract ``_before``, add post-image) folds in via
    ``apply_sum_delta``, stamped (checkpoint, batch_id) in the same
    atomic commit as the data — exactly-once without merge idempotence.
    The view must equal a from-scratch aggregate of the final snapshot,
    in exact BIGINT cents (the oracle rebuilds it from first
    principles over ``orders``)."""
    import os
    import tempfile

    from cascading_hbase_spark.catalog import load_table
    from cascading_hbase_spark.keyed.matview import read_aggregate_view
    from cascading_hbase_spark.keyed.table import (
        SinkMode, delete_keyed, write_keyed,
    )

    root = tempfile.mkdtemp(prefix="chs_smv_")
    base = os.path.join(root, "base")
    view = os.path.join(root, "view")
    ckpt = os.path.join(root, "ckpt")
    k = F.col("o_orderkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 100).alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    seed = orders.filter(k % 10 < 8)
    write_keyed(seed, base, "o_orderkey", retain=10)                   # v1
    # first run: seeds the view at v1 and writes the checkpoint the
    # second run resumes from (zero-change drain)
    S.stream_matview(
        spark, base, view, ckpt, "grp", {"cents_total": "cents"}
    ).awaitTermination()
    updates = seed.filter(k % 5 == 0).withColumn(
        "cents", F.col("cents") * 2
    )
    write_keyed(
        updates.unionByName(orders.filter(k % 10 >= 8)),
        base, "o_orderkey", mode=SinkMode.APPEND,
    )                                                                  # v2
    delete_keyed(spark, base, orders.filter(k % 7 == 0).select("o_orderkey"))  # v3
    S.stream_matview(spark, base, view, ckpt).awaitTermination()
    return read_aggregate_view(spark, view).select(
        "grp", "n_rows", "cents_total"
    )


_STREAM_MATVIEW_MINMAX_ORACLE = """
    SELECT grp,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS cents_total,
           CAST(MIN(cents) AS BIGINT) AS cents_min,
           CAST(MAX(cents) AS BIGINT) AS cents_max
    FROM (
      SELECT o_custkey % 100 AS grp,
             CASE WHEN o_orderkey % 10 < 8 AND o_orderkey % 5 = 0
                  THEN CAST(round(o_totalprice * 100) AS BIGINT) * 2
                  ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS cents
      FROM orders
      WHERE o_orderkey % 7 <> 0
    )
    GROUP BY 1
"""


@query("streaming_matview_minmax", oracle=_STREAM_MATVIEW_MINMAX_ORACLE)
def streaming_matview_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING MIN/MAX MATVIEW (r12, ``streaming/ops.stream_matview``
    with ``mins``/``maxs``): the scheduled-only restriction on extrema
    views is lifted — the checkpoint's write-ahead log names each
    batch's END offset (a base manifest version), so the
    extremum-retraction rescan pins to the batch's end snapshot
    exactly like ``refresh_aggregate_view`` pins both diff ends
    (``_walled_end``; format regression-pinned against the running
    Spark).  Seed a primary at v1 and the view off its snapshot; then
    commit doubled-cents updates + inserts (v2) and a delete wave
    (v3) that removes many per-group extrema (every 7th key,
    including group minima and maxima), and drain from the SAME
    checkpoint: COUNT/SUM fold incrementally, threatened extrema
    re-aggregate per group from the pinned snapshot.  The view must
    equal a from-scratch COUNT/SUM/MIN/MAX aggregate of the final
    snapshot in exact BIGINT cents (the oracle rebuilds it from first
    principles over ``orders``)."""
    import os
    import tempfile

    from cascading_hbase_spark.catalog import load_table
    from cascading_hbase_spark.keyed.matview import read_aggregate_view
    from cascading_hbase_spark.keyed.table import (
        SinkMode, delete_keyed, write_keyed,
    )

    root = tempfile.mkdtemp(prefix="chs_smvx_")
    base = os.path.join(root, "base")
    view = os.path.join(root, "view")
    ckpt = os.path.join(root, "ckpt")
    k = F.col("o_orderkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 100).alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    seed = orders.filter(k % 10 < 8)
    write_keyed(seed, base, "o_orderkey", retain=10)                   # v1
    S.stream_matview(
        spark, base, view, ckpt, "grp", {"cents_total": "cents"},
        mins={"cents_min": "cents"}, maxs={"cents_max": "cents"},
    ).awaitTermination()
    updates = seed.filter(k % 5 == 0).withColumn(
        "cents", F.col("cents") * 2
    )
    write_keyed(
        updates.unionByName(orders.filter(k % 10 >= 8)),
        base, "o_orderkey", mode=SinkMode.APPEND,
    )                                                                  # v2
    delete_keyed(spark, base, orders.filter(k % 7 == 0).select("o_orderkey"))  # v3
    S.stream_matview(spark, base, view, ckpt).awaitTermination()
    return read_aggregate_view(spark, view).select(
        "grp", "n_rows", "cents_total", "cents_min", "cents_max"
    )


_STREAM_INDEX_ORACLE = """
    SELECT o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT)
             * (CASE WHEN o_orderkey % 10 = 5 THEN 2 ELSE 1 END) AS cents
    FROM orders
    WHERE o_orderkey % 7 <> 0
      AND (CASE WHEN o_orderkey % 10 = 0 THEN '1-URGENT'
           ELSE o_orderpriority END) = '1-URGENT'
"""


@query("streaming_index_lookup", oracle=_STREAM_INDEX_ORACLE)
def streaming_index_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING SECONDARY INDEX (r12, ``streaming/ops.stream_index``
    — the third streaming CDC consumer, completing the
    batch/stream x replica/view/index square): seed a keyed table and
    its equality index via a first stream attach, then commit one
    mixed wave — inserts, updates that MOVE the indexed value into the
    looked-up bucket, updates that do NOT touch it (index-silent,
    doubled cents), and deletes — and drain from the SAME checkpoint.
    Each micro-batch MERGEs the index delta and advances the
    freshness stamp to the batch's WAL'd end offset in one atomic
    commit, so ``index_lookup`` through the stream-maintained index
    must return exactly the rows a full-scan filter over the final
    snapshot would — which the oracle computes from first
    principles.

    r13: re-verified under key-encoding v4 (``keyed/index.py`` —
    timestamps as unix micros, decimals as unscaled integers): the
    stream maintainer writes and stamps v4 composite keys, so this
    pair's evidence was re-earned the round the encoding changed."""
    import os
    import tempfile

    from cascading_hbase_spark.catalog import load_table
    from cascading_hbase_spark.keyed.index import index_lookup
    from cascading_hbase_spark.keyed.table import (
        SinkMode, delete_keyed, write_keyed,
    )

    path = os.path.join(tempfile.mkdtemp(prefix="chs_sidx_"), "t")
    ckpt = os.path.join(tempfile.mkdtemp(prefix="chs_sidx_"), "c")
    k = F.col("o_orderkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    seed = orders.filter(k % 10 < 8)
    write_keyed(seed, path, "o_orderkey", retain=10)                   # v1
    # first attach: builds the index at v1 and mints the checkpoint
    S.stream_index(spark, path, "o_orderpriority", ckpt).awaitTermination()
    moved = seed.filter(k % 10 == 0).withColumn(
        "o_orderpriority", F.lit("1-URGENT")
    )
    silent = seed.filter(k % 10 == 5).withColumn(
        "cents", F.col("cents") * 2
    )
    write_keyed(
        moved.unionByName(silent).unionByName(orders.filter(k % 10 >= 8)),
        path, "o_orderkey", mode=SinkMode.APPEND,
    )                                                                  # v2
    delete_keyed(spark, path, orders.filter(k % 7 == 0).select("o_orderkey"))  # v3
    S.stream_index(spark, path, "o_orderpriority", ckpt).awaitTermination()
    return index_lookup(spark, path, "o_orderpriority", "1-URGENT").select(
        "o_orderkey", "cents"
    )
