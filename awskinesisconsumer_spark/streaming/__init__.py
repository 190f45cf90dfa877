"""Structured Streaming layer — the reference's live pipeline
(SURVEY §2 rows 1-2, 7-17, 20-23) re-expressed as streaming DataFrames.
"""

from awskinesisconsumer_spark.streaming.replay import events_stream, table_stream
from awskinesisconsumer_spark.streaming.pipeline import (
    asof_join_stream,
    frame_pipeline,
    segment_rollup_stream,
    set_state_commit_mode,
    throttle_stream,
)
from awskinesisconsumer_spark.streaming.sinks import start_fanout
from awskinesisconsumer_spark.streaming.lifecycle import use_rocksdb_state_store

__all__ = [
    "events_stream",
    "table_stream",
    "asof_join_stream", "frame_pipeline", "segment_rollup_stream",
    "set_state_commit_mode",
    "throttle_stream", "start_fanout", "use_rocksdb_state_store",
]
