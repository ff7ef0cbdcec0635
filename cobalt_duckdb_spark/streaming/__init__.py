from cobalt_duckdb_spark.streaming.events import (
    read_events_stream,
    tumbling_counts,
    sliding_avg,
    session_windows,
    dedup_within_watermark,
    enrich_with_customers,
    running_user_totals,
    correlate_clicks_to_errors,
)

__all__ = [
    "read_events_stream",
    "tumbling_counts",
    "sliding_avg",
    "session_windows",
    "dedup_within_watermark",
    "enrich_with_customers",
    "running_user_totals",
    "correlate_clicks_to_errors",
]
