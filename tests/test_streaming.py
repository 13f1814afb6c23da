"""Structured Streaming: every streaming transform must agree with its
batch formulation on the same data (availableNow processes the fixture
in one pass), and the keyed upsert sink must apply last-write-wins per
micro-batch."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cascading_hbase_spark import streaming as S
from cascading_hbase_spark.catalog import load_table
from cascading_hbase_spark.keyed.table import read_keyed
from cascading_hbase_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_stream_tumbling_equals_batch(spark):
    got = S.run_available_now(S.tumbling_counts(S.events_stream(spark, SF)), "complete")
    want = QUERIES["tumbling_window_agg"](spark, SF)
    assert _rows(got, "w_start", "event_type", "n") == _rows(want, "w_start", "event_type", "n")


def test_stream_session_equals_batch(spark):
    got = S.run_available_now(S.session_counts(S.events_stream(spark, SF)), "complete")
    want = QUERIES["session_window_agg"](spark, SF)
    assert _rows(got, "user_id", "session_start", "n_events") == _rows(
        want, "user_id", "session_start", "n_events"
    )


def test_stream_dedup_one_row_per_key(spark):
    got = S.run_available_now(
        S.dedup_within_watermark(S.events_stream(spark, SF)), "append"
    )
    batch = load_table(spark, SF, "events")
    n_keys = batch.select("user_id", "event_type").distinct().count()
    assert got.count() == n_keys


def test_stateful_running_totals_equals_batch(spark):
    got = S.run_available_now(S.running_user_totals(S.events_stream(spark, SF)), "update")
    want = (
        load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("value_sum"))
    )
    g = {r.user_id: (r.n_events, r.value_sum) for r in got.collect()}
    w = {r.user_id: (r.n_events, r.value_sum) for r in want.collect()}
    assert set(g) == set(w)
    for uid in w:
        assert g[uid][0] == w[uid][0]
        assert g[uid][1] == pytest.approx(w[uid][1], rel=1e-9)


def test_stream_upsert_keyed_sink(spark, tmp_path):
    events = S.events_stream(spark, SF, max_files_per_trigger=1)
    q = S.stream_upsert_keyed(
        events, str(tmp_path / "kt"), key="user_id", checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    stored = read_keyed(spark, str(tmp_path / "kt"))
    n_users = load_table(spark, SF, "events").select("user_id").distinct().count()
    assert stored.count() == n_users


def test_continuous_aggregate_rollup(spark, tmp_path):
    """Continuous aggregate: stream -> tumbling agg (update mode) ->
    foreachBatch keyed upsert on the window key.  After the stream
    drains, the stored rollup must equal the batch rollup — the
    streaming materialized-view pattern built from existing parts."""
    rollup = S.tumbling_counts(S.events_stream(spark, SF)).withColumn(
        "agg_key",
        F.concat_ws("|", F.col("w_start").cast("string"), "event_type"),
    )
    path = str(tmp_path / "rollup_kt")

    def sink(batch_df, batch_id):
        from cascading_hbase_spark.keyed.table import SinkMode, write_keyed

        write_keyed(batch_df, path, key="agg_key", mode=SinkMode.APPEND)

    q = (
        rollup.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    stored = {
        (r.agg_key): (r.n, r.value_sum)
        for r in read_keyed(spark, path).collect()
    }
    want = {
        (f"{r.w_start}|{r.event_type}"): (r.n, r.value_sum)
        for r in QUERIES["tumbling_window_agg"](spark, SF).collect()
    }
    assert stored == want
