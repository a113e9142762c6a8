from .windows import tumbling_event_rollup, windowed_agg, session_windows, streaming_dedup
from .ingest import start_payload_stream, accumulate_then_flush

__all__ = [
    "tumbling_event_rollup",
    "windowed_agg",
    "session_windows",
    "streaming_dedup",
    "start_payload_stream",
    "accumulate_then_flush",
]
