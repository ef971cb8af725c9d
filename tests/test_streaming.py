"""Structured Streaming correctness: the streamed hourly rollup must
equal the batch query on the same input (availableNow drives the
fixture parquet through the full watermark+window pipeline)."""

from __future__ import annotations

import pytest

from ecommerce_data_engineering_spark.plans import REGISTRY
from ecommerce_data_engineering_spark.streaming import (
    run_stream_to_memory, stream_hourly_rollup)


@pytest.mark.timeout(300)
def test_stream_equals_batch(spark, sf_dir):
    streamed = run_stream_to_memory(
        stream_hourly_rollup(spark, sf_dir), "hourly_stream_test")
    batch = (REGISTRY["events_hourly_rollup"].fn(spark, sf_dir)
             .select("window_start", "event_type", "n_events", "total_value"))
    s = {tuple(map(str, r)) for r in streamed.collect()}
    b = {tuple(map(str, r)) for r in batch.collect()}
    assert s == b
