"""Sinks: partitioned parquet writers + view registry.

Covers SURVEY.md §2.1 S4–S6:
  S4 table sink append/overwrite (staging_dag.py:69-76)
  S5 partitioned fact sink — the reference range-partitions facts by
     integer YYYYMMDD date key into monthly partitions
     (database/init.sql:223-242); here the same layout is a parquet
     ``partitionBy`` on a derived month column, which gives Catalyst
     static + dynamic partition pruning for free.
  S6 view sink (analytics_dag.py:339-440) → session-catalog temp views.

Scale note: partitioning by *month* (not day) keeps partition counts
sane at 100 TB (~120 partitions for 10 years) while still pruning
date-range predicates; within a partition, files are sized by Spark's
maxRecordsPerFile/AQE rather than one-file-per-partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def write_partitioned(df: DataFrame, path: str, date_key_col: str = "order_date_key",
                      mode: str = "overwrite") -> None:
    """Write a fact table partitioned by derived month (yyyyMM int).

    Mirrors init.sql:227-242's monthly range partitions; the month is
    derived from the smart date key so readers can prune on either.
    """
    out = df.withColumn(
        "order_month", (F.col(date_key_col).cast("long") / F.lit(100)).cast("int")
    )
    out.write.mode(mode).partitionBy("order_month").parquet(path)


def write_view(df: DataFrame, name: str) -> DataFrame:
    """Register a BI-serving view (analytics_dag.py:423-440 equivalent)."""
    df.createOrReplaceTempView(name)
    return df
