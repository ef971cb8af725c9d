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


def write_clustered(df: DataFrame, path: str, cluster_col: str,
                    n_files: int, mode: str = "overwrite") -> None:
    """Write parquet range-CLUSTERED on ``cluster_col``: rows are
    range-partitioned into ``n_files`` contiguous key ranges and sorted
    within each file (Z-order-lite for a single key).

    Why it matters at 100 TB: parquet row-group min/max statistics only
    skip data when values are LOCALIZED.  A point/range predicate over
    a randomly-laid-out table matches some rows in every file, so every
    row group decodes; over a clustered layout the same predicate's
    value range lives in one (or a few) files and every other row
    group's ``min > x OR max < x`` check fails without decoding a
    byte.  ``tests/test_sources.py::test_clustered_write_file_skipping``
    pins the effect: a narrow filter touches 1 of N clustered files vs
    all N unclustered.

    One range-shuffle at write time (sampled range boundaries, so skew
    in the cluster key still yields balanced files) buys every future
    scan's skipping — the standard warehouse trade.
    """
    (df.repartitionByRange(n_files, F.col(cluster_col))
       .sortWithinPartitions(cluster_col)
       .write.mode(mode).parquet(path))


def write_view(df: DataFrame, name: str) -> DataFrame:
    """Register a BI-serving view (analytics_dag.py:423-440 equivalent)."""
    df.createOrReplaceTempView(name)
    return df


def jdbc_write_options(url: str, table: str,
                       batch_size: int = 10_000,
                       num_partitions: int | None = None,
                       isolation_level: str = "READ_COMMITTED",
                       properties: dict[str, str] | None = None
                       ) -> dict[str, str]:
    """Options for the S7 JDBC *sink* boundary (the reference loads
    Postgres staging/warehouse tables over SQLAlchemy,
    staging_dag.py:30-33, warehouse_dag.py — here it is config).

    Pure function so the surface is testable without a database:
    batched inserts (one round-trip per ``batch_size`` rows) and an
    optional coalesce hint — an uncoordinated 1000-executor write is a
    connection-storm; capping writer parallelism is the standard guard.
    """
    opts = {"url": url, "dbtable": table,
            "batchsize": str(batch_size),
            "isolationLevel": isolation_level}
    if num_partitions is not None:
        opts["numPartitions"] = str(num_partitions)
    opts.update(properties or {})
    return opts


def write_jdbc(df: DataFrame, url: str, table: str,
               mode: str = "append", **kw) -> None:
    """Execute the JDBC write with :func:`jdbc_write_options` — the
    writer twin of ``readers.read_jdbc``.  Exercised (append +
    overwrite) against embedded Derby in
    ``tests/test_sources.py::test_jdbc_roundtrip_embedded_derby``."""
    writer = df.write.format("jdbc").mode(mode)
    for k, v in jdbc_write_options(url, table, **kw).items():
        writer = writer.option(k, v)
    writer.save()
