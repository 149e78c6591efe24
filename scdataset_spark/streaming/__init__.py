from scdataset_spark.streaming.events import (  # noqa: F401
    tumbling_counts,
    sliding_counts,
    session_stats,
    first_event_dedup,
    read_events_stream,
)
