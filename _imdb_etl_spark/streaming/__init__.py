from _imdb_etl_spark.streaming.events import (
    read_events_stream,
    streaming_hourly_rollup,
    streaming_sessionize,
)

__all__ = ["read_events_stream", "streaming_hourly_rollup", "streaming_sessionize"]
