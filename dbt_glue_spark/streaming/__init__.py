from dbt_glue_spark.streaming.pipelines import (
    hourly_event_counts_stream,
    incremental_stream_sink,
    sessionize_stream,
)

__all__ = [
    "hourly_event_counts_stream",
    "incremental_stream_sink",
    "sessionize_stream",
]
