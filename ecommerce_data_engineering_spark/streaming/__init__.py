from .corpus import curated_corpus_incremental
from .events import stream_hourly_rollup, run_stream_to_memory

__all__ = ["curated_corpus_incremental", "stream_hourly_rollup",
           "run_stream_to_memory"]
