from saber_spark.streaming.jobs import (
    read_transcript_stream,
    streaming_session_aggregate,
    streaming_stream_stream_join,
    streaming_windowed_aggregate,
)
from saber_spark.streaming.sink import ExactlyOnceParquetSink

__all__ = [
    "read_transcript_stream",
    "streaming_windowed_aggregate",
    "streaming_session_aggregate",
    "streaming_stream_stream_join",
    "ExactlyOnceParquetSink",
]
