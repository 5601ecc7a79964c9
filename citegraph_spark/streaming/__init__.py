from .events import (
    run_stateful_counts_demo,
    run_windowed_stream_demo,
    streaming_windowed_agg,
)

__all__ = [
    "streaming_windowed_agg",
    "run_windowed_stream_demo",
    "run_stateful_counts_demo",
]
