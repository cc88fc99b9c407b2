from .incremental import apply_changes, compact_changes
from .stream_ops import stream_hourly_counts, stream_sessionize

__all__ = ["apply_changes", "compact_changes", "stream_hourly_counts",
           "stream_sessionize"]
