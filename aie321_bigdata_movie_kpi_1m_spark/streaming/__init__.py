from .events import (
    read_events_stream,
    sessionize_stream,
    windowed_event_counts,
)

__all__ = ["read_events_stream", "sessionize_stream", "windowed_event_counts"]
