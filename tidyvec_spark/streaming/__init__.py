"""Structured Streaming pipelines (engine extension; the reference has
no streaming surface at all — SURVEY.md §2.6 notes its absence).

Design rule: **one transformation function serves batch and stream**.
Each pipeline here takes a DataFrame (batch or streaming — Spark's
unified model) and returns the transformed frame; only the
source/sink/watermark wiring differs. The batch twins are what the
DuckDB oracle checks (events_hourly / events_sessions in
__spark_entry__), so streaming correctness reduces to "same logic,
plus watermark-bounded state".

Scale notes: windowed aggregations and session windows keep per-key
state in the state store — the watermark bounds state size; shuffle
partitioning on the grouping key is the same hash shuffle as batch.
"""

from tidyvec_spark.streaming.pipelines import (
    budget_filter_stream,
    dedup_events,
    event_ns_of,
    event_ts,
    event_ts_of,
    heavy_hitters_stream,
    hourly_rollup,
    ingest_dedup_stream,
    interval_join_stream,
    near_dup_pairs_stream,
    pin_utc_session,
    read_event_stream,
    run_available_now,
    stream_shuffle_partitions,
    session_rollup,
    sessionize_stream,
    stateful_dedup_stream,
    upsert_latest_stream,
    zscore_anomaly_stream,
)

__all__ = [
    "budget_filter_stream",
    "dedup_events",
    "event_ns_of",
    "event_ts",
    "event_ts_of",
    "heavy_hitters_stream",
    "hourly_rollup",
    "ingest_dedup_stream",
    "interval_join_stream",
    "near_dup_pairs_stream",
    "pin_utc_session",
    "read_event_stream",
    "run_available_now",
    "stream_shuffle_partitions",
    "session_rollup",
    "sessionize_stream",
    "stateful_dedup_stream",
    "upsert_latest_stream",
    "zscore_anomaly_stream",
]
