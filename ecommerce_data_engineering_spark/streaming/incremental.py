"""Incremental daily_sales — the reference's daily full-refresh
(analytics_dag.py:150-163) reproduced as a continuous aggregation.

Pattern: stream the orders feed → event-time watermark → per-day
aggregate → ``foreachBatch`` keyed upsert (M2) into a versioned
parquet rollup (sources/versioned.py): each micro-batch folds only the
days it touched and publishes atomically via a commit marker, so the
rollup stays queryable — and never partially visible — between
batches.  This is the hypertable-continuous-aggregate shape: at 100 TB
the orders feed is Kafka and the rollup is partitioned by month, but
the operator graph is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.upsert import keyed_upsert
from ..schemas import FIXTURES


def _orders_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (spark.readStream.schema(FIXTURES["orders"])
            .option("pathGlobFilter", "orders.parquet")
            .parquet(sf_dir.rstrip("/")))


def daily_sales_incremental(spark: SparkSession, sf_dir: str,
                            rollup_path: str, checkpoint: str,
                            timeout_s: int = 180) -> DataFrame:
    """Drive the orders fixture through the streaming rollup; returns
    the final rollup table (equal to the batch daily_sales on the same
    input — asserted in tests)."""
    agg = (
        _orders_stream(spark, sf_dir)
        .withWatermark("o_orderdate", "1 day")
        .groupBy(F.col("o_orderdate").cast("date").alias("sales_date"))
        .agg(
            F.count(F.lit(1)).alias("total_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
             .alias("_rev"),
            F.approx_count_distinct("o_custkey").alias("approx_customers"),
        )
        .select("sales_date", "total_orders",
                F.col("_rev").cast("double").alias("total_revenue"),
                "approx_customers")
    )

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        from ..sources import versioned as V

        sess = batch_df.sparkSession
        batch = batch_df.cache()
        try:
            if V.current_version(sess, rollup_path) is None:
                # first batch: nothing to merge into.  A marker-less
                # root is unambiguous, so no error-string sniffing —
                # any read failure on a committed version is a real
                # failure and fails the batch (checkpoint retries,
                # accumulated rollup stays intact).
                merged = batch
            else:
                merged = keyed_upsert(V.read_current(sess, rollup_path),
                                      batch, "sales_date")
            # atomic publish: readers resolve the previous committed
            # snapshot until the new marker exists — no partial-table
            # window, and crash-before-marker leaves the old rollup
            # live (sources/versioned.py)
            V.publish_version(merged, rollup_path)
            V.vacuum(sess, rollup_path, keep=2)
        finally:
            batch.unpersist()

    q = (agg.writeStream.outputMode("update")
         .foreachBatch(fold)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    if not q.awaitTermination(timeout_s):
        # returns False on timeout instead of raising; falling through
        # would snapshot a rollup the still-running query keeps
        # republishing, and leak the query
        q.stop()
        raise TimeoutError(
            f"incremental rollup did not finish within {timeout_s}s")
    from ..sources import versioned as V
    return V.read_current(spark, rollup_path)
