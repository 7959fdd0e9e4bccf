from .pipeline import (
    TRANSCRIPT_SCHEMA,
    dedup_stream,
    read_transcript_stream,
    reform_fanout_stream,
    windowed_counts_stream,
)
from .sources import (
    KAFKA_SOURCE_SCHEMA,
    decode_json_events,
    kafka_shaped_file_stream,
    kafka_stream,
)
from .stateful import conversation_sessions

__all__ = [
    "TRANSCRIPT_SCHEMA",
    "read_transcript_stream",
    "dedup_stream",
    "reform_fanout_stream",
    "windowed_counts_stream",
    "KAFKA_SOURCE_SCHEMA",
    "decode_json_events",
    "kafka_shaped_file_stream",
    "kafka_stream",
    "conversation_sessions",
]
