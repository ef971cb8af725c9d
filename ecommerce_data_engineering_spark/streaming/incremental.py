"""Incremental daily_sales — the reference's daily full-refresh
(analytics_dag.py:150-163) reproduced as a continuous aggregation.

Pattern: stream the orders feed → event-time watermark → per-day
aggregate → ``foreachBatch`` keyed upsert (M2) into a parquet rollup
table.  Each micro-batch folds only the days it touched; the rollup
table stays queryable between batches.  This is the
hypertable-continuous-aggregate shape: at 100 TB the orders feed is
Kafka and the rollup is partitioned by month, but the operator graph
is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

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
        from pyspark.errors import AnalysisException

        batch = batch_df.cache()
        try:
            try:
                existing = batch_df.sparkSession.read.parquet(rollup_path)
                merged = keyed_upsert(existing, batch, "sales_date")
            except AnalysisException as e:
                # ONLY the first-batch path-missing case may fall back to
                # "nothing to merge into".  Any other read failure (perm,
                # corruption, transient FS error) must fail the batch so
                # the checkpoint retries instead of overwriting the
                # accumulated rollup with one batch's days.
                cond = (e.getCondition() if hasattr(e, "getCondition")
                        else "") or str(e)
                if "PATH_NOT_FOUND" not in cond \
                        and "Path does not exist" not in str(e):
                    raise
                merged = batch
            merged.write.mode("overwrite").parquet(rollup_path + "_next")
            # swap via overwrite of the serving path.  NOTE: parquet-dir
            # overwrite is not atomic for concurrent readers — a reader
            # mid-listing can see a partial table.  The format-free demo
            # accepts that; production uses a table format (Delta/
            # Iceberg) or a versioned-dir + pointer swap for atomicity.
            batch_df.sparkSession.read.parquet(rollup_path + "_next") \
                .write.mode("overwrite").parquet(rollup_path)
        finally:
            batch.unpersist()

    q = (agg.writeStream.outputMode("update")
         .foreachBatch(fold)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(timeout_s)
    return spark.read.parquet(rollup_path)
