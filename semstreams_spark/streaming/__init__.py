from .state_merge import conversation_graph_deltas, DELTA_SCHEMA
from .sink import ExactlyOnceParquetSink
from .pipeline import (
    build_ingest_stream,
    read_transcript_stream,
    read_transcript_stream_from_table,
)
from .rules_stage import StreamingRuleStage, build_ingest_with_rules

__all__ = [
    "conversation_graph_deltas",
    "DELTA_SCHEMA",
    "ExactlyOnceParquetSink",
    "build_ingest_stream",
    "read_transcript_stream",
    "read_transcript_stream_from_table",
    "StreamingRuleStage",
    "build_ingest_with_rules",
]
