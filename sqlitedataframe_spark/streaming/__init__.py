"""Structured Streaming surface — the north-star extension the reference
lacks entirely (it is a fully-materialized batch bridge,
SQLiteDataFrame.swift:440-530; SURVEY §2 Tier B "Streaming" row).
"""

from sqlitedataframe_spark.streaming.core import (
    read_events_stream,
    read_table_stream,
    run_available_now,
    stream_dedup,
    stream_session_window,
    stream_sliding_counts,
    stream_tumbling_counts,
)
from sqlitedataframe_spark.streaming.stateful import stateful_sessionize

__all__ = [
    "read_events_stream",
    "read_table_stream",
    "run_available_now",
    "stream_dedup",
    "stream_session_window",
    "stream_sliding_counts",
    "stream_tumbling_counts",
    "stateful_sessionize",
]
