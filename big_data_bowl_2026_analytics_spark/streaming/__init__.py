from .events import (
    hourly_event_aggregates,
    read_events_stream,
    run_available_now,
    session_aggregates,
)

__all__ = [
    "hourly_event_aggregates",
    "read_events_stream",
    "run_available_now",
    "session_aggregates",
]
