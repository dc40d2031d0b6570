from sri_spark.streaming.drift import run_drift_monitor
from sri_spark.streaming.jobs import (
    read_events_stream,
    run_windowed_stream,
    windowed_event_counts,
)

__all__ = [
    "read_events_stream",
    "windowed_event_counts",
    "run_windowed_stream",
    "run_drift_monitor",
]
