"""Stream-stream join: click→purchase attribution as two live streams.

Structured Streaming joins two unbounded inputs by buffering each side
in watermarked state: a purchase can match clicks up to 1 hour older,
and the time-range condition + watermarks bound how long either side
is retained (without them the state grows forever — the condition IS
the retention policy).  This is the streaming twin of the batch as-of
join (operators/asof.py) with a bounded lookback window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .source import events_stream as _events_stream


def stream_click_purchase_join(spark: SparkSession, sf_dir: str,
                               lookback_minutes: int = 60,
                               src: DataFrame | None = None) -> DataFrame:
    """Purchases joined to same-user clicks within the lookback window.

    ``src`` overrides the fixture-directory source with any
    events-shaped streaming DataFrame — the throughput soak
    (scripts/stream_throughput.py) injects the paced monotone file
    feed; production would inject a Kafka source the same way."""
    ev = src if src is not None else _events_stream(spark, sf_dir)
    clicks = (ev.filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("event_id").alias("click_id"),
                      F.col("ts").alias("click_ts"))
              .withWatermark("click_ts", "2 hours"))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select(F.col("user_id").alias("p_user"),
                         F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("purchase_ts"))
                 .withWatermark("purchase_ts", "2 hours"))
    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts")
           - F.expr(f"INTERVAL {lookback_minutes} MINUTES"))
    )
    return (purchases.join(clicks, cond, "inner")
            .select("purchase_id", F.col("p_user").alias("user_id"),
                    "purchase_ts", "click_id", "click_ts"))
