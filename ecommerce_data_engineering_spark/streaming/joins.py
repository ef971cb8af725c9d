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


def stream_click_purchase_counts(spark: SparkSession, sf_dir: str,
                                 window: str = "1 hour",
                                 src: DataFrame | None = None) -> DataFrame:
    """Pre-aggregated (compacted) attribution: per (user, window) click
    and purchase COUNTS joined key-to-key — the skew-robust twin of
    :func:`stream_click_purchase_join` (VERDICT r9 #7).

    The row-pair join is output-bound under key skew by arithmetic, not
    by any store defect: a user holding c clicks and p purchases in a
    window emits c·p pair ROWS (17.3M on the skew16x fixture's hot
    key).  When the downstream product is a statistic — pairs per user,
    conversion volume, attribution weight — materializing the pairs
    only to re-aggregate them wastes the entire emission.  This
    operator moves the aggregation IN FRONT of the join: each side
    collapses to one count row per (user, window) BEFORE any matching,
    so both join inputs, the join state, and the output are bounded by
    key cardinality.  The hot key becomes one fat count row per side
    and `n_pairs = n_clicks · n_purchases` is computed in O(1) from
    the two counts — the c·p blowup never exists anywhere in the
    pipeline.  (When individual pairs ARE the product, the row-pair
    operator remains the right tool and its throughput is
    output-bound by definition; both are measured side by side in
    evidence/STREAM_BENCH.json.)

    Semantics: same-window attribution — clicks and purchases are
    bucketed into tumbling ``window``s and matched within a bucket
    (the count-join analogue of a bounded lookback; NULL user_ids drop
    in the equi-join exactly as in the row-pair join).  Spark ≥ 3.5
    supports this chain natively: windowed aggregation on BOTH streams
    followed by a stream-stream window equi-join, three stateful
    operators whose watermarks propagate through the window column.
    """
    ev = src if src is not None else _events_stream(spark, sf_dir)
    clicks = (ev.filter(F.col("event_type") == "click")
              .withWatermark("ts", "2 hours")
              .groupBy(F.window("ts", window).alias("win"),
                       F.col("user_id"))
              .agg(F.count(F.lit(1)).alias("n_clicks")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .withWatermark("ts", "2 hours")
                 .groupBy(F.window("ts", window).alias("win"),
                          F.col("user_id"))
                 .agg(F.count(F.lit(1)).alias("n_purchases")))
    return (purchases.join(clicks, ["win", "user_id"], "inner")
            .select(F.col("win.start").alias("window_start"),
                    "user_id", "n_clicks", "n_purchases",
                    (F.col("n_clicks") * F.col("n_purchases"))
                    .alias("n_pairs")))
