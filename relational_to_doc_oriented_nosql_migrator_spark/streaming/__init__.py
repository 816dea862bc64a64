"""Structured Streaming surface (SURVEY §2.11 extension operators)."""

from relational_to_doc_oriented_nosql_migrator_spark.streaming.ops import (
    ORACLES,
    QUERIES,
    read_events_stream,
    run_stream_to_batch,
    stream_to_json_files,
    stream_dedup_keys,
    stream_enrich_agg,
    stream_interval_join,
    stream_session_agg,
    stream_sessionize,
    stream_sliding_agg,
    stream_tumbling_agg,
    stream_user_stats,
)

__all__ = [
    "ORACLES",
    "QUERIES",
    "read_events_stream",
    "run_stream_to_batch",
    "stream_to_json_files",
    "stream_dedup_keys",
    "stream_enrich_agg",
    "stream_interval_join",
    "stream_session_agg",
    "stream_sessionize",
    "stream_sliding_agg",
    "stream_tumbling_agg",
    "stream_user_stats",
]
