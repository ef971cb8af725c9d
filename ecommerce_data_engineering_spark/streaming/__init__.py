from .events import stream_hourly_rollup, run_stream_to_memory

__all__ = ["stream_hourly_rollup", "run_stream_to_memory"]
