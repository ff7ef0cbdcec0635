from cobalt_duckdb_spark.streaming.events import (
    read_events_stream,
    tumbling_counts,
    sliding_avg,
    session_windows,
    dedup_within_watermark,
    dedup_first_event_tws,
    enrich_with_customers,
    running_user_totals,
    running_user_totals_tws,
    correlate_clicks_to_errors,
)

__all__ = [
    "read_events_stream",
    "tumbling_counts",
    "sliding_avg",
    "session_windows",
    "dedup_within_watermark",
    "dedup_first_event_tws",
    "enrich_with_customers",
    "running_user_totals",
    "running_user_totals_tws",
    "correlate_clicks_to_errors",
]
