"""Structured Streaming over the events table (extension surface —
the reference has no streaming, SURVEY.md §2.11; this reproduces the
events_hourly_rollup batch query incrementally).

Pattern: readStream(parquet) → event-time watermark → tumbling window
aggregation → sink.  In production the source is Kafka/files-arriving;
here the fixture parquet directory drives the same query via
Trigger.AvailableNow, which is also the correctness harness: the
streamed result must equal the batch result on the same input.

Late data: the 1-hour watermark bounds state — aggregation state for
windows older than (max event time − 1 h) is evicted, which is what
lets this run forever at firehose scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.rounding import dsum, pround
from .source import events_stream


def stream_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming DataFrame: hourly tumbling counts/sums per event_type.

    total_value uses the SAME exact-decimal sum + portable rounding as
    the batch twin (plans/events.events_hourly_rollup) — a raw double
    sum is order-dependent across micro-batch partials and Spark's
    ``round`` differs from ``pround`` on halfway values, either of
    which would break the streamed-equals-batch contract on a window
    whose value-sum lands on a .xx5 boundary."""
    src = events_stream(spark, sf_dir)
    return (
        src.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            pround(dsum(F.col("value"), scale=4), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type", "n_events", "total_value",
        )
    )


def run_stream_to_memory(stream_df: DataFrame, name: str,
                         timeout_s: int = 120, mode: str = "update",
                         return_progress: bool = False):
    """Drive a streaming query to completion on the available input
    (Trigger.AvailableNow) and return the materialized result.

    ``update`` is the production posture the module docstring claims:
    each micro-batch emits only the windows it changed, and the
    watermark EVICTS state for windows older than the horizon
    (tests/test_streaming.py::test_watermark_evicts_old_window_state
    pins the eviction).  ``complete`` mode — available for ad-hoc
    debugging — retains every window in the state store forever and
    must not be used for an unbounded stream.  With a single
    availableNow batch over a static fixture, update mode emits every
    window exactly once, so the memory table equals the batch result.
    With a MULTI-batch feed (maxFilesPerTrigger on the source) the
    memory table holds one row per update instead — consumers finalize
    by max-n_events per key (scripts/stream_throughput.py).

    ``return_progress=True`` returns ``(result_df, recentProgress)``
    instead of the bare DataFrame — the per-batch input-rate and
    state-operator metrics the throughput record is built from."""
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory").queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        # awaitTermination(timeout) returns False on timeout instead of
        # raising; falling through would return a partially-populated
        # memory table while the query keeps writing (same guard as
        # corpus.py / incremental.py)
        q.stop()
        raise TimeoutError(
            f"streaming query {name!r} did not finish within {timeout_s}s")
    spark = stream_df.sparkSession
    result = spark.sql(f"SELECT * FROM {name}")
    if return_progress:
        # recentProgress: per-micro-batch input rows, trigger durations,
        # and state-operator metrics — the raw material for throughput
        # records (scripts/stream_throughput.py).  The buffer is a ring
        # capped by spark.sql.streaming.numRecentProgressUpdates
        # (default 100): a feed with more micro-batches than the cap
        # would silently DROP the earliest entries, under-counting
        # input rows while the record still reads as complete (ADVICE
        # r6).  Detect actual loss, not buffer fullness: the surviving
        # batchId sequence must be contiguous AND start at batch 0 —
        # a feed that produced exactly `cap` micro-batches loses
        # nothing and must pass (ADVICE r7).
        progress = list(q.recentProgress)
        batch_ids = [p["batchId"] for p in progress]
        expected = list(range(len(batch_ids)))
        if batch_ids != expected:
            raise RuntimeError(
                f"streaming query {name!r}: recentProgress batchIds "
                f"{batch_ids[:3]}..{batch_ids[-3:]} are not the "
                f"contiguous 0-based sequence — the ring buffer "
                f"(spark.sql.streaming.numRecentProgressUpdates) "
                f"dropped early batches; raise it above the "
                f"micro-batch count before trusting these metrics")
        return result, progress
    return result


def stream_deduplicated_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once ingestion: watermarked dropDuplicates on
    the event id — re-delivered events (at-least-once sources) are
    discarded while their id is inside the watermark horizon; state for
    older ids is evicted.  The streaming twin of dedup_exact."""
    src = events_stream(spark, sf_dir)
    return (src.withWatermark("ts", "1 hour")
            .dropDuplicates(["event_id"]))
