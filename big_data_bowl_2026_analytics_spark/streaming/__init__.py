from .events import (
    dedup_within_watermark,
    hourly_event_aggregates,
    purchase_click_attribution,
    read_events_stream,
    run_available_now,
    session_aggregates,
)

__all__ = [
    "dedup_within_watermark",
    "hourly_event_aggregates",
    "purchase_click_attribution",
    "read_events_stream",
    "run_available_now",
    "session_aggregates",
]
