"""Structured Streaming surface: stream binding for the events table,
watermark-bounded windows/dedup, a stateful per-key operator, and the
micro-batch keyed-upsert sink (SURVEY.md §2.10)."""

from cascading_hbase_spark.streaming.ops import (  # noqa: F401
    dedup_within_watermark,
    documents_stream,
    enriched_segment_revenue,
    events_stream,
    exactly_once_ingest,
    read_changefeed_stream,
    stream_ingest_dedup,
    interval_join_clicks_to_purchases,
    run_available_now,
    running_totals_by,
    running_user_totals,
    session_close_on_timeout,
    session_counts,
    sliding_counts,
    stream_index,
    stream_maintained_cms,
    stream_maintained_view,
    stream_matview,
    stream_replica,
    stream_upsert_keyed,
    tumbling_counts,
)
